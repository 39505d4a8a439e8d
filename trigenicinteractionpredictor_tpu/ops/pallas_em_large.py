"""Large-G Pallas path: fused EM stats without G-sized VMEM objects.

The lane-stacked ensemble kernel (ops/pallas_em.py) synthesizes one-hot
[Bt, G] matrices in VMEM for both the theta gather and the theta_hat
scatter-add.  That design is the fastest option at Kuzmin scale (G ~ 10^3:
the one-hots stay small and S restarts share the MXU work), but it caps G
at a few thousand and spends O(G) FLOPs per row (VERDICT round 1, item 3).
This module removes the G ceiling with a three-stage pipeline in which no
kernel buffer scales with G:

1. **Gather via XLA**: th_pos = theta_all[triplets[:, pos]] — a plain row
   gather of the [G, S*K] lane-stacked parameter matrix.  Dynamic row
   gathers are cheap on TPU (memory-bound); it was the *scatter* that
   measured 26x slower than matmuls, not the gather.
2. **Fused E-step kernel** (`_em_tile_kernel_pregathered`): the same
   per-restart factorized algebra as the one-hot kernel, minus gather and
   scatter — inputs are the pre-gathered [Bt, S*K] theta tiles, outputs the
   three position-marginal streams s_pos [Bt, S*K] plus the p sufficient
   statistics and log-likelihood accumulators.  VMEM per tile is O(Bt*S*K +
   Bt*R*K^2), independent of G.
3. **Sorted block scatter kernel** (`_scatter_tile_kernel`): theta_hat is a
   segment-sum of the 3B value rows by gene id.  A host-side plan
   (:func:`make_scatter_plan`, computed once per dataset x sharding) sorts
   the stream by gene id and pads it so every value tile lands in exactly
   one ``wb``-gene output block; the per-tile block index is scalar-
   prefetched (``pltpu.PrefetchScalarGridSpec``) and drives the output
   BlockSpec index map, so the kernel does one local one-hot [Bt, wb]
   matmul per tile — cost O(B*wb*S*K), independent of G — and accumulates
   into the block while consecutive tiles revisit it.

Parity: tests/test_pallas_large.py checks this path against the jnp
reference stats at G up to 50k in interpret mode; dispatch selects it
automatically when the one-hot kernel no longer fits VMEM
(ops/dispatch.py).
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
DEFAULT_WB = 512  # genes per scatter output block


class ScatterPlan(NamedTuple):
    """Host-side gather/scatter plan (see make_scatter_plan)."""

    perm: np.ndarray       # int32 [n_shards * Lp] — local stream indices
    lid: np.ndarray        # int32 [n_shards * Lp] — within-block gene ids
    block: np.ndarray      # int32 [n_shards * n_tiles] — per-tile block
    n_blocks: int          # Q = ceil(G / wb)
    wb: int
    tile: int


def make_scatter_plan(
    triplets: np.ndarray,
    n_genes: int,
    n_shards: int = 1,
    wb: int = DEFAULT_WB,
    tile: int = DEFAULT_TILE_B,
    positions=None,
) -> ScatterPlan:
    """Sort-and-pad plan for the block scatter kernel.

    Computed once per (padded dataset, data-shard count) on the host: for
    each data shard independently (each shard scatters its own contiguous
    row slice inside shard_map), the three positional gene-id streams are
    stably sorted by gene id, split into ``wb``-gene blocks, and each
    block's run padded to a ``tile`` multiple with inert rows (lid = -1
    one-hot-matches nothing) so no value tile straddles two output blocks.
    Every block gets at least one tile (empty blocks must still be zeroed
    by the kernel).  Shards are padded to a common length so the plan
    arrays shard evenly over the ``data`` mesh axis.

    ``positions`` (default: all arity columns) restricts the plan to a
    subset of positional streams — the bdg path (ops/pallas_em_bdg.py)
    scatters only positions (1, 2) because position 0 is fused into its
    E-step kernel.  Slot index (p, b) -> p*B + b enumerates the CHOSEN
    positions in order, matching a value stream stacked the same way.
    """
    N, arity = triplets.shape
    assert N % n_shards == 0, (N, n_shards)
    B = N // n_shards
    Q = -(-n_genes // wb)
    cols = list(range(arity)) if positions is None else list(positions)

    per_shard = []
    for s in range(n_shards):
        rows = triplets[s * B : (s + 1) * B]
        stream_g = rows[:, cols].T.reshape(-1)  # index (p, b) -> p*B + b
        order = np.argsort(stream_g, kind="stable").astype(np.int32)
        g_sorted = stream_g[order]
        counts = np.bincount(g_sorted // wb, minlength=Q)
        perm_parts, lid_parts, blocks = [], [], []
        start = 0
        for q in range(Q):
            c = int(counts[q])
            t_q = max(1, -(-c // tile))
            pad = t_q * tile - c
            perm_parts.append(order[start : start + c])
            lid_parts.append(g_sorted[start : start + c] - q * wb)
            if pad:
                perm_parts.append(np.zeros(pad, np.int32))
                lid_parts.append(np.full(pad, -1, np.int32))
            blocks.extend([q] * t_q)
            start += c
        per_shard.append(
            (
                np.concatenate(perm_parts).astype(np.int32),
                np.concatenate(lid_parts).astype(np.int32),
                np.asarray(blocks, np.int32),
            )
        )

    n_tiles = max(len(b) for _, _, b in per_shard)
    Lp = n_tiles * tile
    perm = np.zeros((n_shards, Lp), np.int32)
    lid = np.full((n_shards, Lp), -1, np.int32)
    block = np.full((n_shards, n_tiles), Q - 1, np.int32)
    for s, (p_, l_, b_) in enumerate(per_shard):
        perm[s, : len(p_)] = p_
        lid[s, : len(l_)] = l_
        block[s, : len(b_)] = b_
    return ScatterPlan(
        perm=perm.reshape(-1),
        lid=lid.reshape(-1),
        block=block.reshape(-1),
        n_blocks=Q,
        wb=wb,
        tile=tile,
    )


def _em_tile_kernel_pregathered(
    # inputs
    th1_ref,       # f32 [Bt, S*K]
    th2_ref,       # f32 [Bt, S*K]
    th3_ref,       # f32 [Bt, S*K]
    r_ref,         # int32 [Bt, 1]
    w_ref,         # f32  [Bt, 1]
    p_m_ref,       # f32  [S*K, R*K*K]
    p_kk_ref,      # f32  [S*K*K, R*K]
    e1_ref,        # f32  [K, K*K]
    e2_ref,        # f32  [K, K*K]
    # outputs
    s1_ref,        # f32 [Bt, S*K] — per-tile write
    s2_ref,        # f32 [Bt, S*K]
    s3_ref,        # f32 [Bt, S*K]
    sacc_ref,      # f32 [S*K*K, R*K] — VMEM accumulator across the grid
    ll_ref,        # f32 [S, 1] SMEM accumulator
    *,
    k: int,
    n_ratings: int,
    n_samples: int,
    strict: bool = False,
):
    """E-step + p-stats for one pre-gathered triplet tile (no G anywhere).

    Same algebra as ops/pallas_em.py::_em_tile_kernel (see that docstring
    for the selector-matrix trick); the theta gather and theta_hat scatter
    are hoisted out of the kernel.
    """
    i = pl.program_id(0)
    K, R, S = k, n_ratings, n_samples
    Bt = r_ref.shape[0]
    K2 = K * K
    # strict: HIGHEST on every MXU matmul (on-chip monotone-L mode).
    prec = jax.lax.Precision.HIGHEST if strict else None

    @pl.when(i == 0)
    def _init():
        sacc_ref[:] = jnp.zeros_like(sacc_ref)
        for s in range(S):
            ll_ref[s, 0] = 0.0

    r_onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (Bt, R), 1) == r_ref[:, 0][:, None]
    ).astype(jnp.float32)
    w = w_ref[:]
    e1, e2 = e1_ref[:], e2_ref[:]
    th1_all, th2_all, th3_all = th1_ref[:], th2_ref[:], th3_ref[:]

    for s in range(S):
        sl = slice(s * K, (s + 1) * K)
        th1, th2, th3 = th1_all[:, sl], th2_all[:, sl], th3_all[:, sl]

        T_all = jnp.dot(
            th3, p_m_ref[s * K : (s + 1) * K, :],
            preferred_element_type=jnp.float32, precision=prec,
        )
        T = jnp.zeros((Bt, K2), jnp.float32)
        for rr in range(R):
            T += T_all[:, rr * K2 : (rr + 1) * K2] * r_onehot[:, rr : rr + 1]

        th1_spread = jnp.dot(th1, e1, preferred_element_type=jnp.float32, precision=prec)
        th2_spread = jnp.dot(th2, e2, preferred_element_type=jnp.float32, precision=prec)

        A1 = jnp.dot(T * th2_spread, e1.T, preferred_element_type=jnp.float32, precision=prec)
        A2 = jnp.dot(T * th1_spread, e2.T, preferred_element_type=jnp.float32, precision=prec)
        D = jnp.sum(th1 * A1, axis=1, keepdims=True)

        W = th1_spread * th2_spread
        A3_all = jnp.dot(
            W, p_kk_ref[s * K2 : (s + 1) * K2, :],
            preferred_element_type=jnp.float32, precision=prec,
        )
        A3 = jnp.zeros((Bt, K), jnp.float32)
        for rr in range(R):
            A3 += A3_all[:, rr * K : (rr + 1) * K] * r_onehot[:, rr : rr + 1]

        scale = w / (D + _EPS)
        s1_ref[:, sl] = th1 * A1 * scale
        s2_ref[:, sl] = th2 * A2 * scale
        s3_ref[:, sl] = th3 * A3 * scale

        V = W * scale
        th3r = jnp.concatenate(
            [th3 * r_onehot[:, rr : rr + 1] for rr in range(R)], axis=1
        )
        sacc_ref[s * K2 : (s + 1) * K2, :] += jnp.dot(
            V.T, th3r, preferred_element_type=jnp.float32, precision=prec
        )
        ll_ref[s, 0] += jnp.sum(w * jnp.log(D + _EPS))


def _scatter_tile_kernel(
    block_ref,     # int32 [n_tiles] scalar-prefetched
    lid_ref,       # int32 [Bt, 1]
    vals_ref,      # f32  [Bt, C]
    out_ref,       # f32  [wb, C] — block chosen by block_ref[i]
    *,
    wb: int,
):
    """One sorted value tile accumulated into its wb-gene output block.

    Consecutive tiles of the same block keep the block resident in VMEM;
    a block change (detected from the prefetched tile->block table) resets
    the accumulator, which doubles as initialization for empty blocks (the
    plan gives every block at least one tile).  Rows with lid = -1 are plan
    padding: the one-hot comparison yields a zero row, so they are inert.
    """
    i = pl.program_id(0)
    Bt = vals_ref.shape[0]
    first = jnp.logical_or(
        i == 0, block_ref[jnp.maximum(i - 1, 0)] != block_ref[i]
    )
    iota = jax.lax.broadcasted_iota(jnp.int32, (Bt, wb), 1)
    oh = (iota == lid_ref[:]).astype(jnp.float32)
    contrib = jnp.dot(oh.T, vals_ref[:], preferred_element_type=jnp.float32)

    @pl.when(first)
    def _():
        out_ref[:] = contrib

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[:] += contrib


@functools.partial(
    jax.jit, static_argnames=("tile_b", "wb", "n_blocks", "interpret", "strict")
)
def _pallas_stats_large(
    thetas: jax.Array,    # [S, G, K]
    ps: jax.Array,        # [S, K, K, K, R]
    triplets: jax.Array,  # int32 [B, 3]
    ratings: jax.Array,
    weights: jax.Array,
    perm: jax.Array,      # int32 [Lp]
    lid: jax.Array,       # int32 [Lp]
    block: jax.Array,     # int32 [n_tiles]
    tile_b: int,
    wb: int,
    n_blocks: int,
    interpret: bool = False,
    strict: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    S, G, K = thetas.shape
    R = ps.shape[-1]
    B = triplets.shape[0]
    assert B % tile_b == 0, f"batch {B} must be padded to a multiple of {tile_b}"
    n_tiles = B // tile_b
    Lp = perm.shape[0]
    assert Lp % tile_b == 0, (Lp, tile_b)
    n_scatter_tiles = Lp // tile_b
    SK = S * K

    theta_all = jnp.transpose(thetas, (1, 0, 2)).reshape(G, SK)
    p_m = jnp.transpose(ps, (0, 3, 4, 1, 2)).reshape(SK, R * K * K)
    p_kk = jnp.transpose(ps, (0, 1, 2, 4, 3)).reshape(S * K * K, R * K)
    e1_np, e2_np = _selectors(K)
    e1, e2 = jnp.asarray(e1_np), jnp.asarray(e2_np)

    # Stage 1: XLA row gathers of the lane-stacked parameter matrix.
    th1 = jnp.take(theta_all, triplets[:, 0], axis=0)
    th2 = jnp.take(theta_all, triplets[:, 1], axis=0)
    th3 = jnp.take(theta_all, triplets[:, 2], axis=0)

    # Stage 2: fused E-step + p-stats kernel (no G-sized buffers).
    kernel = functools.partial(
        _em_tile_kernel_pregathered, k=K, n_ratings=R, n_samples=S,
        strict=strict,
    )
    tile_spec = lambda w: pl.BlockSpec(  # noqa: E731
        (tile_b, w), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    full_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    s1, s2, s3, sacc, ll = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            tile_spec(SK),
            tile_spec(SK),
            tile_spec(SK),
            tile_spec(1),
            tile_spec(1),
            full_spec((SK, R * K * K)),
            full_spec((S * K * K, R * K)),
            full_spec((K, K * K)),
            full_spec((K, K * K)),
        ],
        out_specs=[
            tile_spec(SK),
            tile_spec(SK),
            tile_spec(SK),
            full_spec((S * K * K, R * K)),
            pl.BlockSpec((S, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, SK), jnp.float32),
            jax.ShapeDtypeStruct((B, SK), jnp.float32),
            jax.ShapeDtypeStruct((B, SK), jnp.float32),
            jax.ShapeDtypeStruct((S * K * K, R * K), jnp.float32),
            jax.ShapeDtypeStruct((S, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * 3 * K * K * K * R,
            bytes_accessed=B * SK * 4 * 6,
            transcendentals=B * S,
        ),
        interpret=interpret,
    )(
        th1,
        th2,
        th3,
        ratings[:, None],
        weights[:, None].astype(jnp.float32),
        p_m.astype(jnp.float32),
        p_kk.astype(jnp.float32),
        e1,
        e2,
    )

    # Stage 3: permute the value streams into gene-sorted order (XLA row
    # gather) and scatter-add blockwise.
    s_stream = jnp.concatenate([s1, s2, s3], axis=0)       # [3B, SK]
    vals = jnp.take(s_stream, perm, axis=0)                # [Lp, SK]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_scatter_tiles,),
        in_specs=[
            pl.BlockSpec(
                (tile_b, 1), lambda i, blk: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_b, SK), lambda i, blk: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (wb, SK), lambda i, blk: (blk[i], 0), memory_space=pltpu.VMEM
        ),
    )
    theta_hat_blocks = pl.pallas_call(
        functools.partial(_scatter_tile_kernel, wb=wb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * wb, SK), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Lp * wb * SK,
            bytes_accessed=Lp * SK * 4 + n_blocks * wb * SK * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(block, lid[:, None], vals)

    theta_hat = jnp.transpose(
        theta_hat_blocks[:G].reshape(G, S, K), (1, 0, 2)
    )
    s = jnp.transpose(sacc.reshape(S, K, K, R, K), (0, 1, 2, 4, 3))
    return theta_hat, s, ll[:, 0]


def large_g_ensemble_stats(
    thetas: jax.Array,
    ps: jax.Array,
    batch: Batch,
    precision=None,          # signature compatibility; unused
    tile_b: int = DEFAULT_TILE_B,
    wb: int = DEFAULT_WB,
    n_blocks: int = 0,
    interpret: bool | None = None,
    strict: bool = False,
) -> SweepStats:
    """Whole-ensemble fused sweep for arbitrary G (SweepStats, leading [S]).

    Requires ``batch`` to carry a ScatterPlan (Batch.scatter_*) built by
    :func:`make_scatter_plan` for this exact (padded, sharded) triplet
    array — the trainer attaches it when dispatch selects this path.
    """
    if batch.scatter_perm is None:
        raise ValueError(
            "large-G stats need a scatter plan on the batch; build one with "
            "make_scatter_plan(...) and attach via Batch(scatter_perm=...)"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    theta_hat, s, ll = _pallas_stats_large(
        thetas,
        ps,
        batch.triplets,
        batch.ratings,
        batch.weights,
        batch.scatter_perm,
        batch.scatter_lid,
        batch.scatter_block,
        tile_b=tile_b,
        wb=wb,
        n_blocks=n_blocks,
        interpret=interpret,
        strict=strict,
    )
    return SweepStats(theta_hat=theta_hat, p_hat=ps * s, loglik=ll)
