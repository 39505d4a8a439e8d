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


def ensemble_predict_interaction_batched(
    states: ModelState,
    triplets: jax.Array,
    interact_rating: int = 1,
    precision=None,
) -> jax.Array:
    """Sample-averaged P(interact) with the restart axis BATCHED into one
    dot_general instead of a per-restart loop (the serving fast path).

    The per-restart scoring matmul is [B, K^2] x [K^2, K*R] — contraction
    and output dims of 100 and 20 at the production K=10, latency-bound
    on the MXU exactly like the pre-bdr E-step loop (BASELINE.md round
    3).  Batching the S restarts into one [S, B, K^2] x [S, K^2, K*R]
    dot_general amortizes the invocation cost; DEFAULT precision (None)
    runs the MXU single-pass, which perturbs ranking scores by ~1e-3 —
    irrelevant to AUC at ensemble scale (the eval paths keep the
    HIGHEST-precision per-restart scorer for bit-stable records).
    Measured on-chip vs the loop scorer in BASELINE.md round 5.
    """
    theta, p = states.theta, states.p   # [S, G, K], [S, K, K, K, R]
    S, _, K = theta.shape
    R = p.shape[-1]
    B = triplets.shape[0]
    th1 = jnp.take(theta, triplets[:, 0], axis=1)   # [S, B, K]
    th2 = jnp.take(theta, triplets[:, 1], axis=1)
    th3 = jnp.take(theta, triplets[:, 2], axis=1)
    W = (th1[:, :, :, None] * th2[:, :, None, :]).reshape(S, B, K * K)
    A = jax.lax.dot_general(
        W, p.reshape(S, K * K, K * R),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=precision,
    ).reshape(S, B, K, R)
    probs = jnp.einsum("sbkr,sbk->sbr", A, th3, precision=precision)
    return jnp.mean(probs[:, :, interact_rating], axis=0)


def serve_predict_interaction(
    states: ModelState,
    triplets,
    interact_rating: int = 1,
    block_rows: int = 131072,
    fast: bool = True,
    blocks_per_dispatch: int = 8,
):
    """High-throughput ensemble scoring for large inputs (numpy in/out).

    Round-5 serving measurements (BASELINE.md): the jnp ensemble scorer
    is COMPUTE-bound at ~4.9M rows/s (S=10), the fused Pallas scoring
    kernel (ops/pallas_score.py) runs the same distribution at 56-62M
    rows/s, and on the axon relay the remaining end-to-end cost is the
    host<->device link itself (~50 MB/s).  This harness therefore (1)
    dispatches the kernel on TPU when it fits (``fast``; falls back to
    the restart-batched DEFAULT-precision jnp scorer, then the
    HIGHEST-precision loop scorer with ``fast=False``), and (2) groups
    ``blocks_per_dispatch`` fixed-shape blocks into ONE transfer + ONE
    lax.map dispatch per super-chunk, fetching results only after the
    whole queue is enqueued.  Everything compiles to a single executable
    (tails are padded), so any input length serves warm.

    ``fast`` scores shift ~1e-3 relative (single-pass MXU), immaterial
    for ranking; ``fast=False`` is bit-stable with the eval path.
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

    trigenic = trips.shape[1] == 3
    use_kernel = False
    if fast and trigenic and ensemble and jax.default_backend() == "tpu":
        from trigenicinteractionpredictor_tpu.ops.pallas_score import (
            _fit_score_tile,
        )

        S, G, K = states.theta.shape
        use_kernel = _fit_score_tile(G, K, S) is not None

    def score_block(st, tr):
        if ensemble:
            if use_kernel:
                from trigenicinteractionpredictor_tpu.ops.pallas_score import (
                    pallas_ensemble_predict_interaction,
                )

                return pallas_ensemble_predict_interaction(
                    st, tr, interact_rating, interpret=False
                )
            if fast and trigenic:
                return ensemble_predict_interaction_batched(
                    st, tr, interact_rating
                )
            return ensemble_predict_interaction(st, tr, interact_rating)
        return predict_interaction(st, tr, interact_rating)

    M = max(1, blocks_per_dispatch)

    @jax.jit
    def score_chunk(th, p, tb):       # tb: [M, block, arity]
        st = ModelState(theta=th, p=p)
        return jax.lax.map(lambda t: score_block(st, t), tb)

    # Pad to whole super-chunks so ONE executable serves any length; the
    # waste is at most M-1 block computes on the tail (~2 ms each).
    n_blocks = -(-n // block)
    n_chunks = -(-n_blocks // M)
    padded = np.zeros((n_chunks * M * block, trips.shape[1]), trips.dtype)
    padded[:n] = trips
    chunks = padded.reshape(n_chunks, M, block, trips.shape[1])

    th = jnp.asarray(states.theta)
    p = jnp.asarray(states.p)
    outs = [score_chunk(th, p, jnp.asarray(c)) for c in chunks]
    # One sync for the whole chain: convert after everything is enqueued.
    flat = np.concatenate([np.asarray(o).reshape(-1) for o in outs])
    return flat[:n]
