"""The two scatter-add strategies (segment_sum vs one-hot matmul) must be
numerically interchangeable — the TPU path uses one-hot matmuls because
random scatter serializes there (ops/em.py _scatter_add_rows)."""

import numpy as np
import jax.numpy as jnp

from trigenicinteractionpredictor_tpu.data.synthetic import sample_synthetic_dataset
from trigenicinteractionpredictor_tpu.models.mmsbm import init_state
import jax

from trigenicinteractionpredictor_tpu.ops.em import Batch, em_sufficient_stats


def test_scatter_impls_agree():
    ds, _, _ = sample_synthetic_dataset(2000, 60, 5, n_ratings=2, seed=0)
    state = init_state(jax.random.key(3), ds.n_genes, 5, 2)
    batch = Batch(
        triplets=jnp.asarray(ds.triplets),
        ratings=jnp.asarray(ds.ratings),
        weights=jnp.asarray(ds.weights),
    )
    a = em_sufficient_stats(state.theta, state.p, batch, scatter_impl="segment_sum")
    b = em_sufficient_stats(state.theta, state.p, batch, scatter_impl="onehot")
    np.testing.assert_allclose(
        np.asarray(a.theta_hat), np.asarray(b.theta_hat), atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(a.p_hat), np.asarray(b.p_hat), atol=1e-5)
    np.testing.assert_allclose(float(a.loglik), float(b.loglik), rtol=1e-6)
