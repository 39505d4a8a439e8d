"""Distributed tests without a cluster (SURVEY.md §5.4).

On the 8-virtual-device CPU mesh: 1-device and 8-device runs must produce
the same normalized stats after psum (the collective sums disjoint shards),
and ensemble sharding must match vmapped local execution.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trigenicinteractionpredictor_tpu.data.synthetic import sample_synthetic_dataset
from trigenicinteractionpredictor_tpu.models import init_state
from trigenicinteractionpredictor_tpu.ops.em import Batch, em_step, log_likelihood
from trigenicinteractionpredictor_tpu.parallel.mesh import make_mesh
from trigenicinteractionpredictor_tpu.parallel.sharded_em import (
    make_sharded_likelihood,
    make_sharded_multi_step,
    make_sharded_train_step,
    replicate,
    shard_batch,
    shard_ensemble,
)


def _setup(n=512, g=24, k=3, r=2, seed=0, pad_to=512):
    ds, _, _ = sample_synthetic_dataset(n, g, k, n_ratings=r, seed=seed)
    ds = ds.pad_to(pad_to)
    batch = Batch(
        triplets=jnp.asarray(ds.triplets),
        ratings=jnp.asarray(ds.ratings),
        weights=jnp.asarray(ds.weights),
    )
    return ds, batch


def test_eight_device_matches_single_device():
    ds, batch = _setup(n=500, pad_to=512)
    deg = jnp.asarray(ds.degrees())
    S = 4
    keys = jax.random.split(jax.random.key(0), S)
    states = jax.vmap(lambda k: init_state(k, ds.n_genes, 3, 2))(keys)

    # Single-device truth: plain vmapped em_step.
    ref_states, ref_ll = jax.vmap(em_step, in_axes=(0, None, None))(
        states, batch, deg
    )

    mesh = make_mesh(data=4, ensemble=2)
    step = make_sharded_train_step(mesh)
    sh_states = shard_ensemble(mesh, states)
    sh_batch = shard_batch(mesh, batch)
    new_states, ll = step(sh_states, sh_batch, replicate(mesh, deg))

    np.testing.assert_allclose(
        np.asarray(new_states.theta), np.asarray(ref_states.theta), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new_states.p), np.asarray(ref_states.p), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ref_ll), rtol=1e-5)


@pytest.mark.parametrize("data,ensemble", [(8, 1), (4, 2), (2, 4), (1, 1)])
def test_mesh_shapes_agree(data, ensemble):
    ds, batch = _setup(n=256, pad_to=256, seed=3)
    deg = jnp.asarray(ds.degrees())
    S = 4 if ensemble <= 4 else ensemble
    keys = jax.random.split(jax.random.key(7), S)
    states = jax.vmap(lambda k: init_state(k, ds.n_genes, 3, 2))(keys)

    # Reference first: the sharded step donates (and deletes) its input.
    ref_states, ref_ll = jax.vmap(em_step, in_axes=(0, None, None))(
        states, batch, deg
    )

    results = []
    mesh = make_mesh(data=data, ensemble=ensemble)
    step = make_sharded_train_step(mesh)
    st = shard_ensemble(mesh, states)
    new_states, ll = step(st, shard_batch(mesh, batch), replicate(mesh, deg))
    results.append((np.asarray(new_states.theta), np.asarray(ll)))
    np.testing.assert_allclose(results[0][0], np.asarray(ref_states.theta), atol=1e-5)
    np.testing.assert_allclose(results[0][1], np.asarray(ref_ll), rtol=1e-5)


def test_sharded_likelihood_matches_local():
    ds, batch = _setup(n=512, pad_to=512, seed=9)
    S = 2
    keys = jax.random.split(jax.random.key(1), S)
    states = jax.vmap(lambda k: init_state(k, ds.n_genes, 3, 2))(keys)

    mesh = make_mesh(data=4, ensemble=2)
    ll_fn = make_sharded_likelihood(mesh)
    ll = ll_fn(shard_ensemble(mesh, states), shard_batch(mesh, batch))
    ref = jax.vmap(lambda st: log_likelihood(st, batch))(states)
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ref), rtol=1e-5)


def test_multi_step_matches_chained_single_steps():
    """One scanned n-sweep dispatch == n single-step dispatches, including
    the per-sweep likelihood history rows."""
    ds, batch = _setup(n=512, pad_to=512, seed=6)
    deg = jnp.asarray(ds.degrees())
    mesh = make_mesh(data=4, ensemble=2)
    S, n_inner = 2, 5
    keys = jax.random.split(jax.random.key(2), S)
    states0 = shard_ensemble(
        mesh, jax.vmap(lambda k: init_state(k, ds.n_genes, 3, 2))(keys)
    )
    batch_sh = shard_batch(mesh, batch)
    deg_sh = replicate(mesh, deg)

    step = make_sharded_train_step(mesh)
    ref_states, ref_lls = states0, []
    for _ in range(n_inner):
        ref_states, ll = step(ref_states, batch_sh, deg_sh)
        ref_lls.append(np.asarray(ll))

    multi = make_sharded_multi_step(mesh, n_inner)
    new_states, ll_hist = multi(states0, batch_sh, deg_sh)

    assert ll_hist.shape == (n_inner, S)
    np.testing.assert_allclose(np.asarray(ll_hist), np.stack(ref_lls), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_states.theta), np.asarray(ref_states.theta), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new_states.p), np.asarray(ref_states.p), atol=1e-5
    )


def test_multi_sweep_sharded_run_stays_on_simplex():
    ds, batch = _setup(n=512, pad_to=512, seed=4)
    deg = jnp.asarray(ds.degrees())
    mesh = make_mesh(data=2, ensemble=4)
    step = make_sharded_train_step(mesh)
    keys = jax.random.split(jax.random.key(5), 4)
    states = shard_ensemble(
        mesh, jax.vmap(lambda k: init_state(k, ds.n_genes, 3, 2))(keys)
    )
    batch_sh = shard_batch(mesh, batch)
    deg_sh = replicate(mesh, deg)
    lls = []
    for _ in range(8):
        states, ll = step(states, batch_sh, deg_sh)
        lls.append(np.asarray(ll))
    theta = np.asarray(states.theta)
    np.testing.assert_allclose(theta.sum(axis=-1), 1.0, atol=1e-5)
    # per-restart monotone L
    lls = np.stack(lls)
    assert (np.diff(lls, axis=0) >= -1e-2).all()
