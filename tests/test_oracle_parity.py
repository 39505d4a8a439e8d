"""Engine-vs-oracle parity on toy shapes (SURVEY.md §5.1, BASELINE config 1).

The JAX engine (factorized, f32) must match the independent NumPy oracle
(unfactorized, f64) per-iteration on theta, p, and L to ~1e-5.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from trigenicinteractionpredictor_tpu.data.synthetic import sample_synthetic_dataset
from trigenicinteractionpredictor_tpu.models.mmsbm import ModelState
from trigenicinteractionpredictor_tpu.ops.em import Batch, em_step, log_likelihood
from trigenicinteractionpredictor_tpu.ops.scoring import predict_proba

import oracle


def _toy(n=400, g=20, k=3, r=2, seed=0):
    ds, _, _ = sample_synthetic_dataset(n, g, k, n_ratings=r, seed=seed)
    return ds


def _state_from(theta, p):
    return ModelState(
        theta=jnp.asarray(theta, dtype=jnp.float32),
        p=jnp.asarray(p, dtype=jnp.float32),
    )


def _batch_from(ds):
    return Batch(
        triplets=jnp.asarray(ds.triplets),
        ratings=jnp.asarray(ds.ratings),
        weights=jnp.asarray(ds.weights),
    )


@pytest.mark.parametrize("k,r", [(2, 2), (3, 2), (4, 3)])
def test_single_sweep_matches_oracle(k, r):
    ds = _toy(n=300, g=15, k=k, r=r, seed=k * 10 + r)
    theta0, p0 = oracle.init_params(ds.n_genes, k, r, seed=7)
    degrees = ds.degrees()

    theta1, p1, ll = oracle.em_sweep(theta0, p0, ds.triplets, ds.ratings, degrees)

    state = _state_from(theta0, p0)
    new_state, ll_j = em_step(state, _batch_from(ds), jnp.asarray(degrees))

    np.testing.assert_allclose(np.asarray(new_state.theta), theta1, atol=2e-5)
    np.testing.assert_allclose(np.asarray(new_state.p), p1, atol=2e-5)
    assert abs(float(ll_j) - ll) < 1e-2 * max(1.0, abs(ll) * 1e-4)


def test_multi_sweep_trajectory_matches_oracle():
    ds = _toy(n=500, g=25, k=2, r=2, seed=3)
    theta, p = oracle.init_params(ds.n_genes, 2, 2, seed=11)
    degrees = ds.degrees()
    state = _state_from(theta, p)
    batch = _batch_from(ds)
    deg_j = jnp.asarray(degrees)

    for sweep in range(10):
        theta, p, ll_o = oracle.em_sweep(theta, p, ds.triplets, ds.ratings, degrees)
        state, ll_j = em_step(state, batch, deg_j)
        assert abs(float(ll_j) - ll_o) < 5e-3 * max(1.0, abs(ll_o) / 100.0), sweep
    # f32 drift over 10 sweeps stays tiny on toy shapes
    np.testing.assert_allclose(np.asarray(state.theta), theta, atol=5e-4)
    np.testing.assert_allclose(np.asarray(state.p), p, atol=5e-4)


def test_log_likelihood_matches_oracle():
    ds = _toy(n=250, g=12, k=3, r=2, seed=5)
    theta, p = oracle.init_params(ds.n_genes, 3, 2, seed=2)
    ll_o = oracle.log_likelihood(theta, p, ds.triplets, ds.ratings)
    ll_j = float(log_likelihood(_state_from(theta, p), _batch_from(ds)))
    assert abs(ll_j - ll_o) < 1e-2


def test_predict_proba_matches_oracle():
    ds = _toy(n=100, g=10, k=3, r=3, seed=9)
    theta, p = oracle.init_params(ds.n_genes, 3, 3, seed=4)
    probs_o = oracle.predict_proba(theta, p, ds.triplets)
    probs_j = np.asarray(
        predict_proba(_state_from(theta, p), jnp.asarray(ds.triplets))
    )
    np.testing.assert_allclose(probs_j, probs_o, atol=1e-5)
    np.testing.assert_allclose(probs_j.sum(axis=1), 1.0, atol=1e-4)


def test_padding_rows_are_inert():
    ds = _toy(n=200, g=12, k=3, r=2, seed=1)
    theta0, p0 = oracle.init_params(ds.n_genes, 3, 2, seed=8)
    degrees = ds.degrees()
    state = _state_from(theta0, p0)

    unpadded, ll_u = em_step(state, _batch_from(ds), jnp.asarray(degrees))
    padded_ds = ds.pad_to(256)
    assert padded_ds.n_rows == 256
    padded, ll_p = em_step(state, _batch_from(padded_ds), jnp.asarray(degrees))

    np.testing.assert_allclose(
        np.asarray(unpadded.theta), np.asarray(padded.theta), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(unpadded.p), np.asarray(padded.p), atol=1e-6
    )
    np.testing.assert_allclose(float(ll_u), float(ll_p), atol=1e-3)


def test_row_chunked_stats_match_unchunked_at_odd_b():
    """row_chunk must engage (with weight-0 tail padding) at ANY row count
    — evaluation batches are unpadded with arbitrary/odd lengths."""
    from trigenicinteractionpredictor_tpu.ops.em import em_sufficient_stats

    ds = _toy(n=777, g=18, k=3, r=2, seed=13)  # odd, prime-ish row count
    theta0, p0 = oracle.init_params(ds.n_genes, 3, 2, seed=3)
    state = _state_from(theta0, p0)
    batch = _batch_from(ds)

    full = em_sufficient_stats(state.theta, state.p, batch)
    chunked = em_sufficient_stats(state.theta, state.p, batch, row_chunk=256)
    # f32 reduction order differs between the chunked and whole-batch sums.
    np.testing.assert_allclose(
        np.asarray(chunked.theta_hat), np.asarray(full.theta_hat), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(chunked.p_hat), np.asarray(full.p_hat), rtol=1e-4, atol=1e-7
    )
    np.testing.assert_allclose(
        float(chunked.loglik), float(full.loglik), rtol=1e-5
    )
