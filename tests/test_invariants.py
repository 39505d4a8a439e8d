"""Property/invariant tests (SURVEY.md §5.2).

- simplex invariants on theta rows and p cells after every sweep
- EM monotonicity: the log-likelihood never decreases across sweeps
- permutation equivariance: relabeling gene ids permutes theta rows only
"""

import numpy as np
import jax
import jax.numpy as jnp

from trigenicinteractionpredictor_tpu.data.synthetic import sample_synthetic_dataset
from trigenicinteractionpredictor_tpu.models.mmsbm import ModelState, init_state
from trigenicinteractionpredictor_tpu.ops.em import Batch, em_step, log_likelihood


def _setup(n=600, g=30, k=4, r=2, seed=0):
    ds, _, _ = sample_synthetic_dataset(n, g, k, n_ratings=r, seed=seed)
    batch = Batch(
        triplets=jnp.asarray(ds.triplets),
        ratings=jnp.asarray(ds.ratings),
        weights=jnp.asarray(ds.weights),
    )
    state = init_state(jax.random.key(seed), g, k, r)
    return ds, batch, state


def test_simplex_invariants_hold_across_sweeps():
    ds, batch, state = _setup()
    deg = jnp.asarray(ds.degrees())
    for _ in range(5):
        state, _ = em_step(state, batch, deg)
        theta = np.asarray(state.theta)
        p = np.asarray(state.p)
        assert (theta >= 0).all() and (p >= 0).all()
        np.testing.assert_allclose(theta.sum(axis=1), 1.0, atol=1e-5)
        np.testing.assert_allclose(p.sum(axis=3), 1.0, atol=1e-5)


def test_likelihood_monotone_nondecreasing():
    ds, batch, state = _setup(seed=42)
    deg = jnp.asarray(ds.degrees())
    prev = float(log_likelihood(state, batch))
    for sweep in range(15):
        state, _ = em_step(state, batch, deg)
        cur = float(log_likelihood(state, batch))
        # EM guarantee up to f32 noise on the reduction.
        assert cur >= prev - 1e-3 * abs(prev) * 1e-2 - 1e-3, (sweep, prev, cur)
        prev = cur


def test_em_step_loglik_equals_standalone_on_old_state():
    """em_step returns L of the pre-update state (reference semantics)."""
    ds, batch, state = _setup(seed=7)
    deg = jnp.asarray(ds.degrees())
    ll_standalone = float(log_likelihood(state, batch))
    _, ll_step = em_step(state, batch, deg)
    assert abs(float(ll_step) - ll_standalone) < 1e-3


def test_permutation_equivariance():
    ds, batch, state = _setup(n=400, g=20, k=3, seed=9)
    deg = jnp.asarray(ds.degrees())
    new_state, ll = em_step(state, batch, deg)

    # Relabel genes with a fixed permutation pi: triplet ids map through pi,
    # theta rows permute, p unchanged, L unchanged.
    rng = np.random.default_rng(0)
    pi = rng.permutation(ds.n_genes)  # new_id = pi[old_id]
    perm_trip = jnp.asarray(pi[np.asarray(ds.triplets)])
    # theta_perm[new_id] = theta[old_id]  <=>  theta_perm = theta[inv_pi]
    inv = np.argsort(pi)
    perm_state = ModelState(theta=jnp.asarray(np.asarray(state.theta)[inv]), p=state.p)
    perm_batch = Batch(triplets=perm_trip, ratings=batch.ratings, weights=batch.weights)
    perm_deg = jnp.asarray(np.asarray(deg)[inv])

    perm_new, perm_ll = em_step(perm_state, perm_batch, perm_deg)
    np.testing.assert_allclose(float(perm_ll), float(ll), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(perm_new.theta)[pi], np.asarray(new_state.theta), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(perm_new.p), np.asarray(new_state.p), atol=1e-5)


def test_init_state_on_simplex_and_seed_determinism():
    s1 = init_state(jax.random.key(5), 50, 8, 3)
    s2 = init_state(jax.random.key(5), 50, 8, 3)
    s3 = init_state(jax.random.key(6), 50, 8, 3)
    np.testing.assert_allclose(np.asarray(s1.theta), np.asarray(s2.theta))
    assert not np.allclose(np.asarray(s1.theta), np.asarray(s3.theta))
    np.testing.assert_allclose(np.asarray(s1.theta).sum(axis=1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1.p).sum(axis=3), 1.0, atol=1e-5)
