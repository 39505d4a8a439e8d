"""Held-out triplet scoring (reference layer L5, SURVEY.md §4.4).

The reference's evaluation pass recomputes, for each held-out triplet, the
full rating distribution P(r | i, j, e) from the converged (theta, p), then
averages the interaction probability across restart samples before ranking.
On device this is the same factorized contraction as the E-step denominator,
evaluated for all R ratings at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from trigenicinteractionpredictor_tpu.models.mmsbm import ModelState
from trigenicinteractionpredictor_tpu.ops.em import (
    Batch,
    _barrier,
    _gather_thetas,
    map_restarts,
)


def predict_proba(
    state: ModelState,
    triplets: jax.Array,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """P(r | genes) for every row: f32[B, R].

    Trigenic: score[b, r] = sum_klm theta1[b,k] theta2[b,l] theta3[b,m]
    p[k,l,m,r], computed as W[B,K^2] @ p[K^2, K*R] contracted with theta3 —
    O(B K^2) memory, MXU-shaped.  Digenic rows ([B, 2]) use the pairwise
    family's p[K, K, R] with one fewer contraction.
    """
    theta, p = state.theta, state.p
    K = theta.shape[-1]
    R = p.shape[-1]
    B = triplets.shape[0]
    if triplets.shape[1] == 2:
        th1, th2 = _barrier(_gather_thetas(theta, triplets))
        A2_all = jnp.matmul(th1, p.reshape(K, K * R), precision=precision)
        return jnp.einsum(
            "blr,bl->br", A2_all.reshape(B, K, R), th2, precision=precision
        )
    # _barrier: see ops/em.py — keeps gathers/outer products out of the
    # matmul fusion cluster (axon backend miscompile at large B).
    th1, th2, th3 = _barrier(_gather_thetas(theta, triplets))
    W = _barrier((th1[:, :, None] * th2[:, None, :]).reshape(B, K * K))
    A3_all = jnp.matmul(W, p.reshape(K * K, K * R), precision=precision)
    return jnp.einsum(
        "bmr,bm->br", A3_all.reshape(B, K, R), th3, precision=precision
    )


def predict_interaction(
    state: ModelState,
    triplets: jax.Array,
    interact_rating: int = 1,
) -> jax.Array:
    """P(r = interact | i, j, e): the ranking score for AUC.  f32[B]."""
    return predict_proba(state, triplets)[:, interact_rating]


def ensemble_predict_interaction(
    states: ModelState,
    triplets: jax.Array,
    interact_rating: int = 1,
) -> jax.Array:
    """Average P(interact) over a restart ensemble (leading axis on state).

    Mirrors the reference's sample-averaging protocol (SURVEY.md §1.2):
    probabilities are averaged over S independent restarts before ranking.
    """
    scores = map_restarts(
        lambda st: predict_interaction(st, triplets, interact_rating), states
    )
    return jnp.mean(scores, axis=0)


def serve_predict_interaction(
    states: ModelState,
    triplets,
    interact_rating: int = 1,
    block_rows: int = 131072,
):
    """Chained-dispatch ensemble scoring for large inputs (numpy in/out).

    Serving through the axon relay is dispatch/sync-bound, not compute-
    bound: one synchronized call pays ~25 ms of relay round-trip while the
    compute itself is ~3 ms per 131k rows (BASELINE.md round 1).  This path
    jits ONE fixed block shape, dispatches every block back-to-back without
    synchronizing, and fetches results only after the whole queue is in
    flight — the trick previously buried in the bench, productized for
    ``cmd_predict`` (VERDICT round 1 item 7).  The tail block is padded to
    the block shape so a single executable serves any input length.
    """
    import numpy as np

    trips = np.asarray(triplets)
    n = trips.shape[0]
    if n == 0:
        return np.zeros((0,), np.float32)
    block = min(block_rows, max(n, 1))
    ensemble = (
        states.theta.ndim == 3
    )  # restart-stacked states -> sample-averaged scores

    @jax.jit
    def score_block(th, p, tr):
        st = ModelState(theta=th, p=p)
        if ensemble:
            return ensemble_predict_interaction(st, tr, interact_rating)
        return predict_interaction(st, tr, interact_rating)

    th = jnp.asarray(states.theta)
    p = jnp.asarray(states.p)
    outs = []
    for lo in range(0, n, block):
        chunk = trips[lo : lo + block]
        if chunk.shape[0] < block:  # pad the tail to the compiled shape
            pad = np.zeros((block - chunk.shape[0], chunk.shape[1]), chunk.dtype)
            chunk = np.concatenate([chunk, pad])
        outs.append(score_block(th, p, jnp.asarray(chunk)))
    # One sync for the whole chain: convert after everything is enqueued.
    flat = np.concatenate([np.asarray(o) for o in outs])
    return flat[:n]
