"""bdg: block-diagonal ensemble E-step with a FUSED position-1 gather and
scatter (the round-5 large-G gather attack, VERDICT r4 item 2).

The bd-plan path (ops/pallas_em_bd.py) is gather-engine-bound at large G:
its sweep runs ~6 XLA row-gather passes (three theta gathers in, one
3B-slot value permute, plus the scatter kernel's reads) and the round-5
probe pinned the XLA row gather at ~48 GB/s — 85% of the sweep at
G=100k.  Per-row in-kernel DMA cannot beat it (the Mosaic stack rejects
per-row dynamic-slice DMA outright — probe pinned in BASELINE.md), and a
standalone sorted block-local one-hot gather only TIES the XLA take
(46.5 vs 48.4 GB/s) because its output still needs the same random
unpermute before a row-aligned consumer can use it.

The win is structural, not a faster engine: FUSE one position's gather
and scatter into the E-step kernel so two of the six row-passes vanish.
Rows are pre-sorted on the host by position-1 gene block
(:func:`make_g1_plan`); the kernel's grid then visits gene blocks
monotonically, and a scalar-prefetched tile -> block table drives two
BlockSpec index maps:

- theta block [wb1, SK] IN: position 1's theta rows are VMEM-resident;
  th1 = onehot_local([Bt, wb1]) @ theta_block — an MXU matmul against a
  block the pipeline fetches once per block, instead of an HBM row
  gather per row;
- theta_hat block [wb1, SK] OUT: s1 accumulates into the SAME block via
  onehot_local.T @ s1, with first-visit initialization exactly like the
  sorted-block scatter kernel (ops/pallas_em_large.py) — so position 1
  never enters the value-permute + scatter pipeline at all.

Positions 2 and 3 keep the XLA gather + 2-position scatter plan (their
gene ids are random in a position-1-sorted row order; a single row order
cannot block-localize three independent key columns).  Net: 3 theta
gathers -> 2, value permute 3B -> 2B slots, scatter work 3B -> 2B.

Parity: tests/test_pallas_bdg.py (interpret mode vs the jnp reference);
the runtime integrity sentinel probes it on hardware once dispatched.
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
from trigenicinteractionpredictor_tpu.ops.pallas_em_bd import (
    _bd_params,
    _bd_selectors,
    _plan_scatter,
)

_EPS = 1e-30
DEFAULT_TILE_B = 256
DEFAULT_WB1 = 512


class G1Plan(NamedTuple):
    """Host-side row order for position-1-block-local tiles (per shard)."""

    order: np.ndarray    # int32 [n_shards * Np] row permutation; -1 = pad
    lid1: np.ndarray     # int32 [n_shards * Np] g1 - block*wb1; -1 = pad
    blk1: np.ndarray     # int32 [n_shards * n_tiles] tile -> g1 block
    n_rows: int          # padded rows per shard (Np)
    n_blocks: int        # ceil(G / wb1)
    wb1: int
    tile: int


def make_g1_plan(
    triplets: np.ndarray,
    n_genes: int,
    wb1: int = DEFAULT_WB1,
    tile: int = DEFAULT_TILE_B,
    n_shards: int = 1,
) -> G1Plan:
    """Stable-sort rows by position-1 gene block; pad block runs to tile
    multiples so every tile maps to exactly one theta/theta_hat block.

    Every block gets at least one tile (empty blocks must still be
    initialized by the kernel's first-visit reset).  Shards are padded to
    a common length.  Pad rows carry lid1 = -1 (the local one-hot matches
    nothing -> th1 = 0, and weight 0 keeps every contribution inert).
    """
    N = triplets.shape[0]
    assert N % n_shards == 0, (N, n_shards)
    B = N // n_shards
    Q = -(-n_genes // wb1)
    per_shard = []
    for s in range(n_shards):
        g1 = triplets[s * B : (s + 1) * B, 0]
        order = np.argsort(g1 // wb1, kind="stable").astype(np.int32)
        g_sorted = g1[order]
        counts = np.bincount(g_sorted // wb1, minlength=Q)
        o_parts, l_parts, blocks = [], [], []
        start = 0
        for q in range(Q):
            c = int(counts[q])
            t_q = max(1, -(-c // tile))
            pad = t_q * tile - c
            o_parts.append(order[start : start + c])
            l_parts.append(g_sorted[start : start + c] - q * wb1)
            if pad:
                o_parts.append(np.full(pad, -1, np.int32))
                l_parts.append(np.full(pad, -1, np.int32))
            blocks.extend([q] * t_q)
            start += c
        per_shard.append(
            (
                np.concatenate(o_parts).astype(np.int32),
                np.concatenate(l_parts).astype(np.int32),
                np.asarray(blocks, np.int32),
            )
        )
    n_tiles = max(len(b) for _, _, b in per_shard)
    Np = n_tiles * tile
    order = np.full((n_shards, Np), -1, np.int32)
    lid1 = np.full((n_shards, Np), -1, np.int32)
    blk1 = np.full((n_shards, n_tiles), Q - 1, np.int32)
    for s, (o_, l_, b_) in enumerate(per_shard):
        order[s, : len(o_)] = o_
        lid1[s, : len(l_)] = l_
        blk1[s, : len(b_)] = b_
    return G1Plan(
        order=order.reshape(-1),
        lid1=lid1.reshape(-1),
        blk1=blk1.reshape(-1),
        n_rows=Np,
        n_blocks=Q,
        wb1=wb1,
        tile=tile,
    )


def apply_g1_order(
    plan: G1Plan,
    triplets: np.ndarray,
    ratings: np.ndarray,
    weights: np.ndarray,
    n_shards: int = 1,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Materialize the reordered + padded row arrays (pads weight-0)."""
    N = ratings.shape[0]
    B = N // n_shards
    Np = plan.n_rows
    out_t = np.zeros((n_shards, Np, triplets.shape[1]), triplets.dtype)
    out_r = np.zeros((n_shards, Np), ratings.dtype)
    out_w = np.zeros((n_shards, Np), weights.dtype)
    order = plan.order.reshape(n_shards, Np)
    for s in range(n_shards):
        pad = order[s] < 0
        idx = np.where(pad, 0, order[s])
        out_t[s] = triplets[s * B : (s + 1) * B][idx]
        out_r[s] = np.where(pad, 0, ratings[s * B : (s + 1) * B][idx])
        out_w[s] = np.where(pad, 0, weights[s * B : (s + 1) * B][idx])
    return (
        out_t.reshape(n_shards * Np, -1),
        out_r.reshape(-1),
        out_w.reshape(-1),
    )


def _em_tile_kernel_bdg(
    # scalar prefetch
    blk1_ref,      # int32 [n_tiles] tile -> g1 block
    # inputs
    lid1_ref,      # int32 [Bt, 1]  within-block g1 id; -1 = pad
    th2_ref,       # f32 [Bt, S*K]
    th3_ref,       # f32 [Bt, S*K]
    r_ref,         # int32 [Bt, 1]
    w_ref,         # f32  [Bt, 1]
    theta_blk_ref,  # f32 [wb1, S*K] — block chosen by blk1[i]
    pm_ref,        # f32  [S*K, R*S*K2]
    pkk_ref,       # f32  [S*K2, R*S*K]
    e1_ref,        # f32  [S*K, S*K2]
    e2_ref,        # f32  [S*K, S*K2]
    e1t_ref,       # f32  [S*K2, S*K]
    e2t_ref,       # f32  [S*K2, S*K]
    ks_ref,        # f32  [S*K, S]
    k2s_ref,       # f32  [S, S*K2]
    # outputs
    s2_ref,        # f32 [Bt, S*K]
    s3_ref,        # f32 [Bt, S*K]
    th_hat_ref,    # f32 [wb1, S*K] — block accumulator, chosen by blk1[i]
    cross_ref,     # f32 [S*K2, R*S*K]
    ll_ref,        # f32 [1, S]
    *,
    k: int,
    n_ratings: int,
    n_samples: int,
    wb1: int,
    strict: bool = False,
):
    """One g1-sorted tile: bd ensemble algebra with position 1's gather
    and scatter as local one-hot matmuls against the resident block."""
    prec = jax.lax.Precision.HIGHEST if strict else None
    i = pl.program_id(0)
    K, R, S = k, n_ratings, n_samples
    Bt = r_ref.shape[0]
    SK2 = S * K * K

    @pl.when(i == 0)
    def _init():
        cross_ref[:] = jnp.zeros_like(cross_ref)
        ll_ref[:] = jnp.zeros_like(ll_ref)

    first_of_block = jnp.logical_or(
        i == 0, blk1_ref[jnp.maximum(i - 1, 0)] != blk1_ref[i]
    )

    iota = jax.lax.broadcasted_iota(jnp.int32, (Bt, wb1), 1)
    oh1 = (iota == lid1_ref[:]).astype(jnp.float32)
    th1_all = jnp.dot(
        oh1, theta_blk_ref[:], preferred_element_type=jnp.float32,
        precision=prec,
    )

    r_onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (Bt, R), 1) == r_ref[:, 0][:, None]
    ).astype(jnp.float32)
    w = w_ref[:]
    th2_all, th3_all = th2_ref[:], th3_ref[:]

    T_all = jnp.dot(th3_all, pm_ref[:], preferred_element_type=jnp.float32, precision=prec)
    T = jnp.zeros((Bt, SK2), jnp.float32)
    for rr in range(R):
        T += T_all[:, rr * SK2 : (rr + 1) * SK2] * r_onehot[:, rr : rr + 1]

    spread1 = jnp.dot(th1_all, e1_ref[:], preferred_element_type=jnp.float32, precision=prec)
    spread2 = jnp.dot(th2_all, e2_ref[:], preferred_element_type=jnp.float32, precision=prec)

    A1 = jnp.dot(T * spread2, e1t_ref[:], preferred_element_type=jnp.float32, precision=prec)
    A2 = jnp.dot(T * spread1, e2t_ref[:], preferred_element_type=jnp.float32, precision=prec)

    Dsum = jnp.dot(
        th1_all * A1, ks_ref[:], preferred_element_type=jnp.float32, precision=prec,
    )                                                       # [Bt, S]
    scale_S = w / (Dsum + _EPS)
    scale = jnp.dot(
        scale_S, ks_ref[:].T, preferred_element_type=jnp.float32, precision=prec
    )                                                       # [Bt, SK]

    W = spread1 * spread2
    A3_all = jnp.dot(W, pkk_ref[:], preferred_element_type=jnp.float32, precision=prec)
    A3 = jnp.zeros_like(th2_all)
    SK = S * K
    for rr in range(R):
        A3 += A3_all[:, rr * SK : (rr + 1) * SK] * r_onehot[:, rr : rr + 1]

    s1 = th1_all * A1 * scale
    s2_ref[:] = th2_all * A2 * scale
    s3_ref[:] = th3_all * A3 * scale

    # Position 1's scatter, fused: accumulate into the resident block.
    contrib = jnp.dot(
        oh1.T, s1, preferred_element_type=jnp.float32, precision=prec
    )

    @pl.when(first_of_block)
    def _set():
        th_hat_ref[:] = contrib

    @pl.when(jnp.logical_not(first_of_block))
    def _acc():
        th_hat_ref[:] += contrib

    scale2 = jnp.dot(scale_S, k2s_ref[:], preferred_element_type=jnp.float32, precision=prec)
    V = W * scale2
    th3r_parts = []
    for rr in range(R):
        th3r_parts.append(th3_all * r_onehot[:, rr : rr + 1])
    th3r = jnp.concatenate(th3r_parts, axis=1)
    cross_ref[:] += jnp.dot(
        V.T, th3r, preferred_element_type=jnp.float32, precision=prec
    )

    ll_tile = jnp.log(Dsum + _EPS) * w
    ll_ref[:] += jnp.sum(ll_tile, axis=0, keepdims=True)


@functools.partial(
    jax.jit,
    static_argnames=("tile_b", "wb1", "n_blocks1", "interpret", "strict"),
)
def _bdg_estep(
    thetas: jax.Array,    # [S, G, K]
    ps: jax.Array,        # [S, K, K, K, R]
    triplets: jax.Array,  # int32 [B, 3] — in g1-plan order
    ratings: jax.Array,
    weights: jax.Array,
    lid1: jax.Array,      # int32 [B]
    blk1: jax.Array,      # int32 [n_tiles]
    tile_b: int,
    wb1: int,
    n_blocks1: int,
    interpret: bool = False,
    strict: bool = False,
):
    """Fused-g1 E-step.  Returns (streams [2, B, SK] for positions 2/3,
    theta_hat g1 partial [G, SK] padded to blocks, p-stat factor, ll)."""
    S, G, K = thetas.shape
    R = ps.shape[-1]
    B = triplets.shape[0]
    assert B % tile_b == 0, (B, tile_b)
    n_tiles = B // tile_b
    assert blk1.shape == (n_tiles,), (blk1.shape, n_tiles)
    SK, K2 = S * K, K * K
    SK2 = S * K2

    theta_all = jnp.transpose(thetas, (1, 0, 2)).reshape(G, SK)
    Gp = n_blocks1 * wb1
    theta_pad = jnp.zeros((Gp, SK), jnp.float32).at[:G].set(theta_all)
    P_m_bd, P_kk_bd = _bd_params(ps.astype(jnp.float32))
    E1, E2, KS, K2S = _bd_selectors(K, S)

    th2 = jnp.take(theta_all, triplets[:, 1], axis=0)
    th3 = jnp.take(theta_all, triplets[:, 2], axis=0)

    kernel = functools.partial(
        _em_tile_kernel_bdg,
        k=K, n_ratings=R, n_samples=S, wb1=wb1, strict=strict,
    )
    tile_spec = lambda w_: pl.BlockSpec(  # noqa: E731
        (tile_b, w_), lambda i, b: (i, 0), memory_space=pltpu.VMEM
    )
    full_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, b: (0, 0), memory_space=pltpu.VMEM
    )
    blk_spec = pl.BlockSpec(
        (wb1, SK), lambda i, b: (b[i], 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            tile_spec(1),            # lid1
            tile_spec(SK),           # th2
            tile_spec(SK),           # th3
            tile_spec(1),            # r
            tile_spec(1),            # w
            blk_spec,                # theta block
            full_spec((SK, R * SK2)),
            full_spec((SK2, R * SK)),
            full_spec((SK, SK2)),
            full_spec((SK, SK2)),
            full_spec((SK2, SK)),
            full_spec((SK2, SK)),
            full_spec((SK, S)),
            full_spec((S, SK2)),
        ],
        out_specs=[
            tile_spec(SK),           # s2
            tile_spec(SK),           # s3
            blk_spec,                # theta_hat block accumulator
            full_spec((SK2, R * SK)),
            full_spec((1, S)),
        ],
    )
    s2, s3, th_hat_blocks, cross, ll = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, SK), jnp.float32),
            jax.ShapeDtypeStruct((B, SK), jnp.float32),
            jax.ShapeDtypeStruct((Gp, SK), jnp.float32),
            jax.ShapeDtypeStruct((SK2, R * SK), jnp.float32),
            jax.ShapeDtypeStruct((1, S), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (SK * SK2 * (3 * R + 4) + 2 * wb1 * SK),
            bytes_accessed=B * SK * 4 * 4 + Gp * SK * 4 * 2,
            transcendentals=B * S,
        ),
        interpret=interpret,
    )(
        blk1,
        lid1[:, None],
        th2,
        th3,
        ratings[:, None],
        weights[:, None].astype(jnp.float32),
        theta_pad,
        P_m_bd,
        P_kk_bd,
        jnp.asarray(E1),
        jnp.asarray(E2),
        jnp.asarray(E1.T),
        jnp.asarray(E2.T),
        jnp.asarray(KS),
        jnp.asarray(K2S),
    )
    cross5 = cross.reshape(S, K2, R, S, K)
    s_diag = cross5[jnp.arange(S), :, :, jnp.arange(S), :]
    s_stats = jnp.transpose(
        s_diag.reshape(S, K, K, R, K), (0, 1, 2, 4, 3)
    )
    return jnp.stack([s2, s3]), th_hat_blocks[:G], s_stats, ll[0, :]


def bdg_em_ensemble_stats(
    thetas: jax.Array,
    ps: jax.Array,
    batch: Batch,
    precision=None,          # signature compatibility; unused
    tile_b: int = DEFAULT_TILE_B,
    wb1: int = DEFAULT_WB1,
    n_blocks1: int = 0,
    wb: int = 512,
    n_blocks: int = 0,
    interpret: bool | None = None,
    strict: bool = False,
) -> SweepStats:
    """Whole-ensemble fused sweep, g1-block-local gather/scatter (any G).

    Requires rows in :func:`make_g1_plan` order with ``batch.g1_lid`` /
    ``batch.g1_block`` attached, plus a 2-POSITION scatter plan
    (``make_scatter_plan(..., positions=(1, 2))`` on the REORDERED rows)
    in ``batch.scatter_*``.
    """
    if batch.g1_lid is None or batch.g1_block is None:
        raise ValueError(
            "bdg stats need batch.g1_lid/g1_block from make_g1_plan (rows "
            "must be in that plan's order)"
        )
    if batch.scatter_perm is None:
        raise ValueError(
            "bdg stats need a 2-position scatter plan on the batch "
            "(make_scatter_plan(positions=(1, 2)) over the g1-ordered rows)"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    S, G, K = thetas.shape
    streams, th_hat_g1, s_stats, ll = _bdg_estep(
        thetas,
        ps,
        batch.triplets,
        batch.ratings,
        batch.weights,
        batch.g1_lid,
        batch.g1_block,
        tile_b=tile_b,
        wb1=wb1,
        n_blocks1=n_blocks1 or -(-G // wb1),
        interpret=interpret,
        strict=strict,
    )
    th_hat_23 = _plan_scatter(
        streams, batch.scatter_perm, batch.scatter_lid, batch.scatter_block,
        wb=wb, n_blocks=n_blocks or -(-G // wb), g=G, interpret=interpret,
    )
    theta_hat = th_hat_g1 + th_hat_23[:G]
    theta_hat = jnp.transpose(theta_hat.reshape(G, S, K), (1, 0, 2))
    return SweepStats(theta_hat=theta_hat, p_hat=ps * s_stats, loglik=ll)


bdg_em_ensemble_stats.ensemble = True  # type: ignore[attr-defined]
