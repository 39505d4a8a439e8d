"""Rating-sorted one-hot ensemble kernel: no rating masks in the tile body.

Round-3 stage timing (BASELINE.md roofline) attributes most of the one-hot
kernel's time to the per-restart tile-body algebra, a large slice of which
is rating handling: the R-wide T_all/A3_all matmuls and their [Bt, K^2]
mask-and-sum selects (~R x the useful width in both MXU and VPU terms),
plus the th3r mask/concat feeding the p-stats.  But the rating of a row is
STATIC — so instead of selecting per row at runtime, sort the rows by
rating once on the host and make every kernel tile rating-pure:

- :func:`rating_sort_pad` stably sorts rows by rating and pads each rating
  class to a tile multiple with weight-0 rows (inert), emitting the
  int32[n_tiles] tile -> rating table;
- the table is scalar-prefetched (``pltpu.PrefetchScalarGridSpec``) and
  drives the BlockSpec index maps of the p views — each tile sees ONLY its
  rating's [S*K, K^2] / [S*K^2, K] slice — and of the p-stats accumulator,
  whose per-rating block is visited as one contiguous run (sorted order =>
  monotone visits), initialized on first touch like the scatter kernel;
- the tile body is the one-hot ensemble algebra of ops/pallas_em.py with
  every rating select deleted: T and A3 are computed at width K^2 / K
  directly, and the p-stat matmul right operand is plain th3.

Row order is irrelevant to correctness everywhere else: the one-hot
gather/scatter matmuls and the degree-normalized M-step are permutation
invariant, and weight-0 padding is inert (tests/test_invariants.py).

Composes with the ensemble lane-stacking and the sharded step; the trainer
sorts each shard's rows independently (order within a shard is free).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trigenicinteractionpredictor_tpu.ops.em import Batch, SweepStats
from trigenicinteractionpredictor_tpu.ops.pallas_em import _selectors

_EPS = 1e-30
DEFAULT_TILE_B = 512


class RatingSortPlan(NamedTuple):
    """Host-side row order for rating-pure tiles (per data shard)."""

    order: np.ndarray      # int32 [n_shards * Bp] — row permutation (padded)
    tile_r: np.ndarray     # int32 [n_shards * n_tiles] — tile -> rating
    n_rows: int            # padded rows per shard (Bp)


def rating_sort_pad(
    ratings: np.ndarray,
    n_ratings: int,
    tile: int = DEFAULT_TILE_B,
    n_shards: int = 1,
    n_tiles: int = 0,
) -> RatingSortPlan:
    """Stable-sort rows by rating per shard; pad classes to tile multiples.

    Padding rows replicate row 0 of the shard with weight zeroed by the
    caller (the returned ``order`` indexes INTO the shard; callers build
    the padded arrays with :func:`apply_rating_sort`).  Every rating class
    gets at least one tile so its p-stat accumulator block is always
    initialized.  Shards are padded to a common length.

    ``n_tiles`` (optional) forces a per-shard tile count — callers that
    sort many same-size row sets into one fixed layout (the stepwise
    trainer sorts every minibatch of an epoch) pass the worst case
    ``ceil(B / tile) + n_ratings`` so all plans share one shape.
    """
    N = ratings.shape[0]
    assert N % n_shards == 0, (N, n_shards)
    B = N // n_shards
    per_shard = []
    for s in range(n_shards):
        r = ratings[s * B : (s + 1) * B]
        order = np.argsort(r, kind="stable").astype(np.int32)
        r_sorted = r[order]
        counts = np.bincount(r_sorted, minlength=n_ratings)
        o_parts, tiles = [], []
        start = 0
        for rr in range(n_ratings):
            c = int(counts[rr])
            t_q = max(1, -(-c // tile))
            pad = t_q * tile - c
            o_parts.append(order[start : start + c])
            if pad:
                o_parts.append(np.full(pad, -1, np.int32))  # inert padding
            tiles.extend([rr] * t_q)
            start += c
        per_shard.append((np.concatenate(o_parts), np.asarray(tiles, np.int32)))

    auto_tiles = max(len(t) for _, t in per_shard)
    if n_tiles:
        assert n_tiles >= auto_tiles, (
            f"forced n_tiles={n_tiles} < required {auto_tiles} "
            f"(B={B}, tile={tile}, n_ratings={n_ratings})"
        )
    n_tiles = n_tiles or auto_tiles
    Bp = n_tiles * tile
    order = np.full((n_shards, Bp), -1, np.int32)
    tile_r = np.zeros((n_shards, n_tiles), np.int32)
    for s, (o_, t_) in enumerate(per_shard):
        order[s, : len(o_)] = o_
        # common-length padding tiles inherit the last class (inert rows)
        pad_tiles = n_tiles - len(t_)
        if pad_tiles:
            t_ = np.concatenate([t_, np.full(pad_tiles, t_[-1], np.int32)])
        tile_r[s] = t_
    return RatingSortPlan(
        order=order.reshape(-1), tile_r=tile_r.reshape(-1), n_rows=Bp
    )


def apply_rating_sort(
    plan: RatingSortPlan,
    triplets: np.ndarray,
    ratings: np.ndarray,
    weights: np.ndarray,
    n_shards: int = 1,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Materialize the sorted+padded row arrays (padding rows weight-0).

    The rating of a padding row is forced to its tile's class so tiles
    stay rating-pure even though the weight already makes them inert.
    """
    N = ratings.shape[0]
    B = N // n_shards
    Bp = plan.n_rows
    n_tiles = plan.tile_r.shape[0] // n_shards
    tile = Bp // n_tiles
    out_t = np.empty((n_shards, Bp, triplets.shape[1]), triplets.dtype)
    out_r = np.empty((n_shards, Bp), ratings.dtype)
    out_w = np.zeros((n_shards, Bp), weights.dtype)
    order = plan.order.reshape(n_shards, Bp)
    tile_r = plan.tile_r.reshape(n_shards, n_tiles)
    for s in range(n_shards):
        pad = order[s] < 0
        idx = np.where(pad, 0, order[s])
        out_t[s] = triplets[s * B : (s + 1) * B][idx]
        out_r[s] = np.repeat(tile_r[s], tile)
        out_w[s] = np.where(pad, 0, weights[s * B : (s + 1) * B][idx])
    return (
        out_t.reshape(n_shards * Bp, -1),
        out_r.reshape(-1),
        out_w.reshape(-1),
    )


def _em_tile_kernel_rsorted(
    # scalar prefetch
    tile_r_ref,    # int32 [n_tiles]
    # inputs
    trip_ref,      # int32 [Bt, 3]
    w_ref,         # f32  [Bt, 1]
    theta_ref,     # f32  [G, S*K]
    p_m_ref,       # f32  [1, S*K, K*K]   THIS TILE'S rating block (leading
    p_kk_ref,      # f32  [1, S*K*K, K]   rating dim blocked to 1 — Mosaic
    e1_ref,        # f32  [K, K*K]        wants block minor dims = overall)
    e2_ref,        # f32  [K, K*K]
    # outputs
    theta_hat_ref,  # f32 [G, S*K] — VMEM accumulator
    s_ref,          # f32 [1, S*K*K, K] — THIS TILE'S rating block of stats
    ll_ref,         # f32 [S, 1] SMEM
    *,
    k: int,
    n_samples: int,
):
    """One rating-pure triplet tile: the pallas_em algebra, zero masks."""
    i = pl.program_id(0)
    K, S = k, n_samples
    Bt = trip_ref.shape[0]
    G = theta_ref.shape[0]
    K2 = K * K

    @pl.when(i == 0)
    def _init_global():
        theta_hat_ref[:] = jnp.zeros_like(theta_hat_ref)
        for s in range(S):
            ll_ref[s, 0] = 0.0

    # First tile of this rating's contiguous run initializes its stats
    # block (sorted rows => each block is one monotone run of tiles).
    first_of_block = jnp.logical_or(
        i == 0, tile_r_ref[jnp.maximum(i - 1, 0)] != tile_r_ref[i]
    )

    @pl.when(first_of_block)
    def _init_block():
        s_ref[:] = jnp.zeros_like(s_ref)

    p_m = p_m_ref[0]
    p_kk = p_kk_ref[0]

    theta = theta_ref[:]
    gene_iota = jax.lax.broadcasted_iota(jnp.int32, (Bt, G), 1)

    def onehot(pos: int):
        return (gene_iota == trip_ref[:, pos][:, None]).astype(jnp.float32)

    oh1, oh2, oh3 = onehot(0), onehot(1), onehot(2)
    th1_all = jnp.dot(oh1, theta, preferred_element_type=jnp.float32)
    th2_all = jnp.dot(oh2, theta, preferred_element_type=jnp.float32)
    th3_all = jnp.dot(oh3, theta, preferred_element_type=jnp.float32)
    w = w_ref[:]
    e1, e2 = e1_ref[:], e2_ref[:]

    s_tiles = []
    ll_parts = []
    for s in range(S):
        sl = slice(s * K, (s + 1) * K)
        th1, th2, th3 = th1_all[:, sl], th2_all[:, sl], th3_all[:, sl]

        # T[b,(k,l)] = sum_m th3[b,m] p_s[k,l,m, r_tile] — no select.
        T = jnp.dot(
            th3, p_m[s * K : (s + 1) * K, :],
            preferred_element_type=jnp.float32,
        )
        th1_spread = jnp.dot(th1, e1, preferred_element_type=jnp.float32)
        th2_spread = jnp.dot(th2, e2, preferred_element_type=jnp.float32)

        A1 = jnp.dot(T * th2_spread, e1.T, preferred_element_type=jnp.float32)
        A2 = jnp.dot(T * th1_spread, e2.T, preferred_element_type=jnp.float32)
        D = jnp.sum(th1 * A1, axis=1, keepdims=True)

        W = th1_spread * th2_spread
        A3 = jnp.dot(
            W, p_kk[s * K2 : (s + 1) * K2, :],
            preferred_element_type=jnp.float32,
        )

        scale = w / (D + _EPS)
        s_tiles.append((th1 * A1 * scale, th2 * A2 * scale, th3 * A3 * scale))

        V = W * scale
        contrib = jnp.dot(V.T, th3, preferred_element_type=jnp.float32)

        @pl.when(first_of_block)
        def _set():
            s_ref[0, s * K2 : (s + 1) * K2, :] = contrib

        @pl.when(jnp.logical_not(first_of_block))
        def _acc():
            s_ref[0, s * K2 : (s + 1) * K2, :] += contrib

        ll_parts.append(jnp.sum(w * jnp.log(D + _EPS)))

    s1_all = jnp.concatenate([t[0] for t in s_tiles], axis=1)
    s2_all = jnp.concatenate([t[1] for t in s_tiles], axis=1)
    s3_all = jnp.concatenate([t[2] for t in s_tiles], axis=1)
    theta_hat_ref[:] += (
        jnp.dot(oh1.T, s1_all, preferred_element_type=jnp.float32)
        + jnp.dot(oh2.T, s2_all, preferred_element_type=jnp.float32)
        + jnp.dot(oh3.T, s3_all, preferred_element_type=jnp.float32)
    )
    for s in range(S):
        ll_ref[s, 0] += ll_parts[s]


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def _pallas_stats_rsorted(
    thetas: jax.Array,   # [S, G, K]
    ps: jax.Array,       # [S, K, K, K, R]
    triplets: jax.Array,
    weights: jax.Array,
    tile_r: jax.Array,   # int32 [n_tiles]
    tile_b: int = DEFAULT_TILE_B,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    S, G, K = thetas.shape
    R = ps.shape[-1]
    B = triplets.shape[0]
    assert B % tile_b == 0, f"batch {B} must be padded to a multiple of {tile_b}"
    n_tiles = B // tile_b
    assert tile_r.shape == (n_tiles,), (tile_r.shape, n_tiles)
    K2 = K * K

    theta_all = jnp.transpose(thetas, (1, 0, 2)).reshape(G, S * K)
    # Rating blocks ride the SUBLANE (row) axis: Mosaic requires non-full
    # lane blocks to be 128-multiples, so the prefetched rating index
    # selects a row block of the full lane width instead:
    # p_m [R, S*K, K^2] -> [R*S*K, K^2]; p_kk [R, S*K^2, K] -> [R*S*K^2, K].
    p_m = jnp.transpose(ps, (4, 0, 3, 1, 2)).reshape(R, S * K, K2)
    p_kk = jnp.transpose(ps, (4, 0, 1, 2, 3)).reshape(R, S * K2, K)
    e1_np, e2_np = _selectors(K)
    e1, e2 = jnp.asarray(e1_np), jnp.asarray(e2_np)

    kernel = functools.partial(
        _em_tile_kernel_rsorted, k=K, n_samples=S
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_b, 3), lambda i, tr: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1), lambda i, tr: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, S * K), lambda i, tr: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S * K, K2), lambda i, tr: (tr[i], 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S * K2, K), lambda i, tr: (tr[i], 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, K2), lambda i, tr: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, K2), lambda i, tr: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G, S * K), lambda i, tr: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S * K2, K), lambda i, tr: (tr[i], 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1), lambda i, tr: (0, 0), memory_space=pltpu.SMEM),
        ],
    )
    theta_hat, s, ll = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((G, S * K), jnp.float32),
            jax.ShapeDtypeStruct((R, S * K2, K), jnp.float32),
            jax.ShapeDtypeStruct((S, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (6 * G * S * K + S * 3 * K * K * K),
            bytes_accessed=B * (3 * 4 + 4) + G * S * K * 4 * 2,
            transcendentals=B * S,
        ),
        interpret=interpret,
    )(
        tile_r,
        triplets,
        weights[:, None].astype(jnp.float32),
        theta_all.astype(jnp.float32),
        p_m.astype(jnp.float32),
        p_kk.astype(jnp.float32),
        e1,
        e2,
    )
    theta_hat = jnp.transpose(theta_hat.reshape(G, S, K), (1, 0, 2))
    # s rows are (r, s, k, l), cols m -> [S, K, K, K, R]
    s = jnp.transpose(s.reshape(R, S, K, K, K), (1, 2, 3, 4, 0))
    return theta_hat, s, ll[:, 0]


def rsorted_em_ensemble_stats(
    thetas: jax.Array,
    ps: jax.Array,
    batch: Batch,
    precision=None,      # signature compatibility; unused
    tile_b: int = DEFAULT_TILE_B,
    interpret: bool | None = None,
) -> SweepStats:
    """Whole-ensemble fused sweep over rating-sorted rows.

    Requires ``batch.tile_rating`` (int32 [n_tiles]) from
    :func:`rating_sort_pad`; rows must be in that plan's order.  Ratings
    travel via the tile table, not per-row arrays.
    """
    if batch.tile_rating is None:
        raise ValueError(
            "rsorted stats need batch.tile_rating; build with "
            "rating_sort_pad(...) and reorder rows with apply_rating_sort"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    theta_hat, s, ll = _pallas_stats_rsorted(
        thetas,
        ps,
        batch.triplets,
        batch.weights,
        batch.tile_rating,
        tile_b=tile_b,
        interpret=interpret,
    )
    return SweepStats(theta_hat=theta_hat, p_hat=ps * s, loglik=ll)


rsorted_em_ensemble_stats.ensemble = True  # type: ignore[attr-defined]
