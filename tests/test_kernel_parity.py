"""Pallas kernel vs jnp einsum path parity (SURVEY.md §5.3).

Runs the kernel in interpreter mode on CPU across shapes, including ragged
tails handled by weight-0 padding rows.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trigenicinteractionpredictor_tpu.data.synthetic import sample_synthetic_dataset
from trigenicinteractionpredictor_tpu.models.mmsbm import init_state
from trigenicinteractionpredictor_tpu.ops.em import (
    Batch,
    em_step,
    em_sufficient_stats,
)
from trigenicinteractionpredictor_tpu.ops.pallas_em import pallas_em_sufficient_stats


def _setup(n, g, k, r, seed=0, pad_to=None, tile_b=None):
    ds, _, _ = sample_synthetic_dataset(n, g, k, n_ratings=r, seed=seed)
    if pad_to:
        ds = ds.pad_to(pad_to)
    batch = Batch(
        triplets=jnp.asarray(ds.triplets),
        ratings=jnp.asarray(ds.ratings),
        weights=jnp.asarray(ds.weights),
    )
    state = init_state(jax.random.key(seed + 1), g, k, r)
    return ds, batch, state


@pytest.mark.parametrize(
    "n,g,k,r,tile_b",
    [
        (256, 20, 3, 2, 128),
        (512, 50, 10, 2, 256),
        (300, 32, 4, 3, 128),   # ragged: pads 300 -> 384
        (128, 16, 2, 2, 128),   # single tile
    ],
)
def test_kernel_matches_jnp_path(n, g, k, r, tile_b):
    ds, batch, state = _setup(n, g, k, r, seed=k, pad_to=tile_b)
    ref = em_sufficient_stats(state.theta, state.p, batch)
    out = pallas_em_sufficient_stats(
        state.theta, state.p, batch, tile_b=tile_b, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out.theta_hat), np.asarray(ref.theta_hat), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.p_hat), np.asarray(ref.p_hat), atol=1e-5
    )
    np.testing.assert_allclose(
        float(out.loglik), float(ref.loglik), rtol=1e-5
    )


def test_kernel_in_em_step():
    """The kernel slots into em_step via stats_fn and yields the same sweep."""
    ds, batch, state = _setup(512, 40, 5, 2, seed=9, pad_to=256)
    deg = jnp.asarray(ds.degrees())
    ref_state, ref_ll = em_step(state, batch, deg)
    out_state, out_ll = em_step(
        state,
        batch,
        deg,
    )
    # swap stats fn manually
    from trigenicinteractionpredictor_tpu.ops.em import normalize_from_stats

    stats = pallas_em_sufficient_stats(
        state.theta, state.p, batch, tile_b=256, interpret=True
    )
    k_state = normalize_from_stats(state, stats, deg)
    np.testing.assert_allclose(
        np.asarray(k_state.theta), np.asarray(ref_state.theta), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(k_state.p), np.asarray(ref_state.p), atol=1e-5
    )
    np.testing.assert_allclose(float(stats.loglik), float(ref_ll), rtol=1e-5)


@pytest.mark.parametrize(
    "n,g,k,r,s,tile_b",
    [
        (512, 40, 5, 2, 3, 256),
        (300, 32, 4, 3, 2, 128),   # ragged: pads 300 -> 384, R=3
        (256, 1500, 6, 2, 2, 128),  # G past the one-hot kernel's comfort zone
    ],
)
def test_hybrid_kernel_matches_vmapped_jnp(n, g, k, r, s, tile_b):
    """XLA-gather + in-kernel-scatter hybrid == vmapped jnp stats."""
    from trigenicinteractionpredictor_tpu.ops.pallas_em_hybrid import (
        hybrid_em_ensemble_stats,
    )

    ds, batch, _ = _setup(n, g, k, r, seed=7, pad_to=tile_b)
    keys = jax.random.split(jax.random.key(1), s)
    states = jax.vmap(lambda kk: init_state(kk, g, k, r))(keys)
    ref = jax.vmap(
        lambda th, p: em_sufficient_stats(
            th, p, batch, precision=jax.lax.Precision.HIGHEST
        )
    )(states.theta, states.p)
    out = hybrid_em_ensemble_stats(
        states.theta, states.p, batch, tile_b=tile_b, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out.theta_hat), np.asarray(ref.theta_hat), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.p_hat), np.asarray(ref.p_hat), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.loglik), np.asarray(ref.loglik), rtol=1e-5
    )


@pytest.mark.parametrize("group", [0, 2, 1])
def test_bdr_group_widths_match_jnp(group):
    """Restart sub-grouping (overcompute vs invocation-count knob) is
    numerically inert: group in {S, 2, 1} all match the jnp reference."""
    from trigenicinteractionpredictor_tpu.ops.pallas_em_bdr import (
        bdr_em_ensemble_stats,
    )
    from trigenicinteractionpredictor_tpu.ops.pallas_em_rsorted import (
        apply_rating_sort,
        rating_sort_pad,
    )

    n, g, k, r, s, tile_b = 600, 50, 5, 2, 4, 128
    ds, batch, _ = _setup(n, g, k, r, seed=21)
    plan = rating_sort_pad(np.asarray(batch.ratings), r, tile=tile_b)
    t_, r_, w_ = apply_rating_sort(
        plan, np.asarray(batch.triplets), np.asarray(batch.ratings),
        np.asarray(batch.weights),
    )
    sorted_batch = Batch(
        triplets=jnp.asarray(t_), ratings=jnp.asarray(r_),
        weights=jnp.asarray(w_), tile_rating=jnp.asarray(plan.tile_r),
    )
    keys = jax.random.split(jax.random.key(5), s)
    states = jax.vmap(lambda kk: init_state(kk, g, k, r))(keys)
    ref = jax.vmap(
        lambda th, p: em_sufficient_stats(
            th, p, batch, precision=jax.lax.Precision.HIGHEST
        )
    )(states.theta, states.p)
    out = bdr_em_ensemble_stats(
        states.theta, states.p, sorted_batch,
        tile_b=tile_b, group=group, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out.theta_hat), np.asarray(ref.theta_hat), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.loglik), np.asarray(ref.loglik), rtol=1e-5
    )


@pytest.mark.parametrize(
    "n,g,k,r,s,tile_b,wb",
    [
        (512, 40, 5, 2, 3, 256, 32),
        (300, 32, 4, 3, 2, 128, 16),    # ragged pad, R=3
        (256, 1500, 6, 2, 2, 128, 512),  # large-G regime
    ],
)
def test_bd_kernel_matches_vmapped_jnp(n, g, k, r, s, tile_b, wb):
    """Block-diagonal ensemble kernel + plan scatter == vmapped jnp stats."""
    from trigenicinteractionpredictor_tpu.ops.pallas_em_bd import (
        bd_em_ensemble_stats,
    )
    from trigenicinteractionpredictor_tpu.ops.pallas_em_large import (
        make_scatter_plan,
    )

    ds, batch, _ = _setup(n, g, k, r, seed=11, pad_to=tile_b)
    plan = make_scatter_plan(
        np.asarray(batch.triplets), g, n_shards=1, wb=wb, tile=tile_b
    )
    batch = batch._replace(
        scatter_perm=jnp.asarray(plan.perm),
        scatter_lid=jnp.asarray(plan.lid),
        scatter_block=jnp.asarray(plan.block),
    )
    keys = jax.random.split(jax.random.key(2), s)
    states = jax.vmap(lambda kk: init_state(kk, g, k, r))(keys)
    ref = jax.vmap(
        lambda th, p: em_sufficient_stats(
            th, p, batch, precision=jax.lax.Precision.HIGHEST
        )
    )(states.theta, states.p)
    out = bd_em_ensemble_stats(
        states.theta, states.p, batch,
        tile_b=tile_b, wb=wb, n_blocks=plan.n_blocks, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out.theta_hat), np.asarray(ref.theta_hat), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.p_hat), np.asarray(ref.p_hat), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.loglik), np.asarray(ref.loglik), rtol=1e-5
    )


def test_ensemble_kernel_matches_vmapped_jnp():
    """S stacked restarts in one kernel call == vmapped jnp stats."""
    import jax

    ds, batch, _ = _setup(512, 40, 5, 2, seed=3, pad_to=256)
    S = 3
    keys = jax.random.split(jax.random.key(0), S)
    from trigenicinteractionpredictor_tpu.models.mmsbm import init_state
    from trigenicinteractionpredictor_tpu.ops.pallas_em import (
        pallas_em_ensemble_stats,
    )

    states = jax.vmap(lambda k: init_state(k, 40, 5, 2))(keys)
    ref = jax.vmap(lambda th, p: em_sufficient_stats(th, p, batch))(
        states.theta, states.p
    )
    out = pallas_em_ensemble_stats(
        states.theta, states.p, batch, tile_b=256, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out.theta_hat), np.asarray(ref.theta_hat), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.p_hat), np.asarray(ref.p_hat), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.loglik), np.asarray(ref.loglik), rtol=1e-5
    )


@pytest.mark.parametrize("group,s", [(1, 4), (2, 4), (4, 4), (1, 3), (3, 3)])
def test_bdrg_grid_groups_match_jnp(group, s):
    """bdrg (restart groups on the grid — the large-K band kernel) matches
    the jnp reference for every group width, including p-stats."""
    from trigenicinteractionpredictor_tpu.ops.pallas_em_bdrg import (
        bdrg_em_ensemble_stats,
    )
    from trigenicinteractionpredictor_tpu.ops.pallas_em_rsorted import (
        apply_rating_sort,
        rating_sort_pad,
    )

    n, g, k, r, tile_b = 600, 50, 5, 2, 128
    ds, batch, _ = _setup(n, g, k, r, seed=23)
    plan = rating_sort_pad(np.asarray(batch.ratings), r, tile=tile_b)
    t_, r_, w_ = apply_rating_sort(
        plan, np.asarray(batch.triplets), np.asarray(batch.ratings),
        np.asarray(batch.weights),
    )
    sorted_batch = Batch(
        triplets=jnp.asarray(t_), ratings=jnp.asarray(r_),
        weights=jnp.asarray(w_), tile_rating=jnp.asarray(plan.tile_r),
    )
    keys = jax.random.split(jax.random.key(5), s)
    states = jax.vmap(lambda kk: init_state(kk, g, k, r))(keys)
    ref = jax.vmap(
        lambda th, p: em_sufficient_stats(
            th, p, batch, precision=jax.lax.Precision.HIGHEST
        )
    )(states.theta, states.p)
    out = bdrg_em_ensemble_stats(
        states.theta, states.p, sorted_batch,
        tile_b=tile_b, group=group, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out.theta_hat), np.asarray(ref.theta_hat), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.p_hat), np.asarray(ref.p_hat), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.loglik), np.asarray(ref.loglik), rtol=1e-5
    )
