"""bdr kernel: block-diagonal ensemble algebra in the one-hot kernel,
over rating-sorted tiles.  The round-3 flagship (BASELINE.md roofline).

Measured stage economics at the G=1000/K=10/S=10 headline shape
(tools/kernel_race.py + the 2026-08-20 stage-timing job):

- XLA row gathers are ~10x off the HBM roof on the axon chip (4 ms for
  three [131k, 100] takes) — any path that gathers outside the kernel
  loses more than its kernel saves (hybrid: 148M vs one-hot 162M).
  => keep the one-hot gather/scatter MATMULS (they are well-shaped MXU
  passes, ~3-6 us/tile) and never touch HBM mid-sweep.
- The per-restart tile-body loop costs ~5.1 ms/sweep (70 tiny
  latency-bound K^2-matmuls + R-select masks per tile); the bd rewrite
  (ops/pallas_em_bd.py) cut that stage to ~2.8 ms by batching all S
  restarts into one matmul per algebra stage against block-diagonal
  operands.
- Rating masks halve again: rows sorted by rating (ops/pallas_em_rsorted
  machinery) make tiles rating-pure, so the prefetched tile->rating index
  picks the p row-block and every R-select disappears while T/A3/cross
  run at 1/R width.

This kernel composes all three: per tile it runs

    th*_all = oh* @ theta                      # 3 G-matmuls (gather)
    T       = th3_all @ Pm_bd[r]               # [Bt, S*K^2]
    spreadX = thX_all @ E_bd                   # 2x [Bt, S*K^2]
    A1/A2   = (T * spread) @ E_bd.T            # 2x [Bt, S*K]
    Dsum    = (th1_all * A1) @ KS              # [Bt, S]
    A3      = (spread1*spread2) @ Pkk_bd[r]    # [Bt, S*K]
    cross[r]+= V.T @ th3_all                   # p-stats, ALL restarts
    theta_hat += oh*.T @ s*_all                # 3 G-matmuls (scatter)

~16 MXU matmuls per tile, INDEPENDENT of S (ensemble width rides lane
dimensions and block-diagonal FLOP overcompute, which is free at the
measured ~2-12% MXU utilization).  No [Bt, *] intermediate ever reaches
HBM.  VMEM scales with Bt*S*K^2, so the tile shrinks as S*K^2 grows
(ops/dispatch.py bdr fit model).

Parity: tests/test_kernel_parity.py (interpret mode); the trainer path
sorts rows with rating_sort_pad/apply_rating_sort and attaches
Batch.tile_rating.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trigenicinteractionpredictor_tpu.ops.em import Batch, SweepStats
from trigenicinteractionpredictor_tpu.ops.pallas_em_bd import _bd_selectors

_EPS = 1e-30
DEFAULT_TILE_B = 256


def _bdr_params(
    ps: jax.Array, group: int
) -> Tuple[jax.Array, jax.Array]:
    """Per-GROUP block-diagonal p views (rebuilt per sweep in XLA).

    Only the (s == s') diagonal blocks of the full [SK, SK2] block-diagonal
    operands are ever multiplied, so the kernel takes an nb-stack of
    per-group blocks instead — an nb-fold VMEM cut that makes wide
    ensembles (S ~ 50) fit a single call.

    Pm_bd  [R, nb, gK, gK2]: block gi has row (s, m), col (s', (k,l)) for
    the restarts in group gi, p[s,k,l,m,r] on the within-group diagonal.
    Pkk_bd [R, nb, gK2, gK] likewise.
    """
    S, K = ps.shape[0], ps.shape[1]
    R = ps.shape[-1]
    K2 = K * K
    g = group
    nb = S // g
    p_rskl_m = jnp.transpose(ps, (4, 0, 3, 1, 2)).reshape(R, nb, g, K, K2)
    eye = jnp.eye(g, dtype=ps.dtype)
    # Pm_bd[r, n, (s,m), (t,(k,l))] = p_rskl_m[r, n, s, m, kl] * eye[s, t]
    pm = jnp.einsum("rnsmc,st->rnsmtc", p_rskl_m, eye)
    Pm_bd = pm.reshape(R, nb, g * K, g * K2)
    p_rsklm = jnp.transpose(ps, (4, 0, 1, 2, 3)).reshape(R, nb, g, K2, K)
    pk = jnp.einsum("rnscm,st->rnsctm", p_rsklm, eye)
    Pkk_bd = pk.reshape(R, nb, g * K2, g * K)
    return Pm_bd, Pkk_bd


def _em_tile_kernel_bdr(
    # scalar prefetch
    tile_r_ref,    # int32 [n_tiles]
    # inputs
    trip_ref,      # int32 [Bt, 3]
    w_ref,         # f32  [Bt, 1]
    theta_ref,     # f32  [G, S*K]
    pm_ref,        # f32  [1, nb, gK, gK2]  this rating's per-group blocks
    pkk_ref,       # f32  [1, nb, gK2, gK]  (leading rating dim blocked to 1)
    e1_ref,        # f32  [gK, gK2]  ONE group's spread selector (shared)
    e2_ref,        # f32  [gK, gK2]
    e1t_ref,       # f32  [gK2, gK]
    e2t_ref,       # f32  [gK2, gK]
    ks_ref,        # f32  [gK, g]
    kst_ref,       # f32  [g, gK]
    k2s_ref,       # f32  [g, gK2]
    # outputs
    theta_hat_ref,  # f32 [G, S*K] — VMEM accumulator
    cross_ref,      # f32 [1, S*K2, gK] — this rating's p-stat cross blocks
    ll_ref,         # f32 [1, S] — VMEM row accumulator
    *,
    k: int,
    n_samples: int,
    group: int,
    strict: bool = False,
):
    i = pl.program_id(0)
    K, S = k, n_samples
    Bt = trip_ref.shape[0]
    G = theta_ref.shape[0]
    # strict: HIGHEST on every MXU matmul, so the monotone-likelihood EM
    # invariant holds on-chip (EngineConfig.precision='strict'); fast keeps
    # the DEFAULT bf16 operand passes (see precision note below).
    prec = jax.lax.Precision.HIGHEST if strict else None

    @pl.when(i == 0)
    def _init_global():
        theta_hat_ref[:] = jnp.zeros_like(theta_hat_ref)
        ll_ref[:] = jnp.zeros_like(ll_ref)

    first_of_block = jnp.logical_or(
        i == 0, tile_r_ref[jnp.maximum(i - 1, 0)] != tile_r_ref[i]
    )

    theta = theta_ref[:]
    gene_iota = jax.lax.broadcasted_iota(jnp.int32, (Bt, G), 1)

    def onehot(pos: int):
        return (gene_iota == trip_ref[:, pos][:, None]).astype(jnp.float32)

    oh1, oh2, oh3 = onehot(0), onehot(1), onehot(2)
    th1_all = jnp.dot(oh1, theta, preferred_element_type=jnp.float32, precision=prec)
    th2_all = jnp.dot(oh2, theta, preferred_element_type=jnp.float32, precision=prec)
    th3_all = jnp.dot(oh3, theta, preferred_element_type=jnp.float32, precision=prec)
    w = w_ref[:]

    # The gK2-wide algebra runs per restart GROUP: the block-diagonal
    # operands waste FLOPs quadratically in the group width, so sub-
    # grouping trades overcompute against matmul-invocation count
    # (group == S is one matmul per stage; group == 1 degenerates to the
    # old per-restart loop).  Operands arrive as an nb-stack of per-group
    # diagonal blocks (pm_ref[0, gi]) — never the full [SK, SK2]
    # block-diagonal matrix, whose off-group blocks are all zero — and
    # the selector matrices are a SINGLE group's block, identical for
    # every group.  VMEM for operands is therefore nb-fold smaller than
    # the naive layout, which is what lets wide ensembles (S ~ 50) run
    # as one kernel call.
    nb = S // group
    gK, gK2 = group * K, group * K * K
    A1_parts, A2_parts, A3_parts, W_parts, D_parts = [], [], [], [], []
    e1 = e1_ref[:]
    e2 = e2_ref[:]
    e1t = e1t_ref[:]
    e2t = e2t_ref[:]
    ks = ks_ref[:]
    # NB: do not name the loop variable ``i`` — it would shadow the grid
    # index read at the top (used by first_of_block above, but shadowing
    # invites exactly that bug on the next edit).
    for gi in range(nb):
        rsl = slice(gi * gK, (gi + 1) * gK)
        th1_i = th1_all[:, rsl]
        th2_i = th2_all[:, rsl]
        th3_i = th3_all[:, rsl]
        T_i = jnp.dot(
            th3_i, pm_ref[0, gi], preferred_element_type=jnp.float32, precision=prec
        )
        sp1_i = jnp.dot(th1_i, e1, preferred_element_type=jnp.float32, precision=prec)
        sp2_i = jnp.dot(th2_i, e2, preferred_element_type=jnp.float32, precision=prec)
        A1_i = jnp.dot(
            T_i * sp2_i, e1t, preferred_element_type=jnp.float32, precision=prec
        )
        A1_parts.append(A1_i)
        A2_parts.append(jnp.dot(
            T_i * sp1_i, e2t, preferred_element_type=jnp.float32, precision=prec
        ))
        W_i = sp1_i * sp2_i
        W_parts.append(W_i)
        A3_parts.append(jnp.dot(
            W_i, pkk_ref[0, gi], preferred_element_type=jnp.float32, precision=prec
        ))
        D_parts.append(jnp.dot(
            th1_i * A1_i, ks, preferred_element_type=jnp.float32, precision=prec
        ))                                                   # [Bt, g]
    if nb == 1:
        A1, A2, A3g = A1_parts[0], A2_parts[0], A3_parts[0]
    else:
        A1 = jnp.concatenate(A1_parts, axis=1)
        A2 = jnp.concatenate(A2_parts, axis=1)
        A3g = jnp.concatenate(A3_parts, axis=1)

    # Precision note (measured on-chip 2026-08-20): with the MXU's DEFAULT
    # bf16 operand passes the 60-sweep likelihood trace shows max drops of
    # ~3e-4 relative (-37 nats at |L| ~ 9e4) — the same envelope as the
    # one-hot incumbent (-41 nats), i.e. pre-existing on-chip numerics,
    # not a bd regression; exact monotonicity holds in f32 (CPU tests).
    # Forcing HIGHEST on the scale-chain matmuls only shrank the drop to
    # -28 nats while costing 30% throughput (4.35 vs 3.34 ms/sweep), so
    # DEFAULT stays.
    Dsum = (
        D_parts[0] if nb == 1 else jnp.concatenate(D_parts, axis=1)
    )                                                       # [Bt, S]
    scale_S = w / (Dsum + _EPS)
    kst = kst_ref[:]
    if nb == 1:
        scale = jnp.dot(scale_S, kst, preferred_element_type=jnp.float32, precision=prec)
    else:
        scale = jnp.concatenate(
            [
                jnp.dot(
                    scale_S[:, gi * group : (gi + 1) * group],
                    kst,
                    preferred_element_type=jnp.float32, precision=prec,
                )
                for gi in range(nb)
            ],
            axis=1,
        )                                                   # [Bt, SK]

    A3 = A3g

    s1 = th1_all * A1 * scale
    s2 = th2_all * A2 * scale
    s3 = th3_all * A3 * scale

    # Cross p-stats run per group too: only the within-restart diagonal
    # blocks of [SK2, SK] are ever read, so each group needs just its
    # [gK2, gK] cross — an S/group-fold FLOP cut on the single biggest
    # matmul (2*Bt*S^2*K^3 at full width), and it kills the full-width W
    # concat.  The nb group blocks stack along rows: out is [SK2, gK].
    k2s = k2s_ref[:]
    contrib_parts = []
    for gi in range(nb):
        rsl = slice(gi * gK, (gi + 1) * gK)
        scale2_i = jnp.dot(
            scale_S[:, gi * group : (gi + 1) * group],
            k2s,
            preferred_element_type=jnp.float32, precision=prec,
        )                                                   # [Bt, gK2]
        V_i = W_parts[gi] * scale2_i
        contrib_parts.append(jnp.dot(
            V_i.T, th3_all[:, rsl], preferred_element_type=jnp.float32, precision=prec
        ))
    contrib = (
        contrib_parts[0] if nb == 1
        else jnp.concatenate(contrib_parts, axis=0)
    )

    @pl.when(first_of_block)
    def _set():
        cross_ref[0] = contrib

    @pl.when(jnp.logical_not(first_of_block))
    def _acc():
        cross_ref[0] += contrib

    theta_hat_ref[:] += (
        jnp.dot(oh1.T, s1, preferred_element_type=jnp.float32, precision=prec)
        + jnp.dot(oh2.T, s2, preferred_element_type=jnp.float32, precision=prec)
        + jnp.dot(oh3.T, s3, preferred_element_type=jnp.float32, precision=prec)
    )
    ll_tile = jnp.log(Dsum + _EPS) * w                      # [Bt, S]
    ll_ref[:] += jnp.sum(ll_tile, axis=0, keepdims=True)


@functools.partial(
    jax.jit, static_argnames=("tile_b", "group", "interpret", "strict")
)
def _pallas_stats_bdr(
    thetas: jax.Array,   # [S, G, K]
    ps: jax.Array,       # [S, K, K, K, R]
    triplets: jax.Array,
    weights: jax.Array,
    tile_r: jax.Array,   # int32 [n_tiles]
    tile_b: int = DEFAULT_TILE_B,
    group: int = 0,
    interpret: bool = False,
    strict: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    S, G, K = thetas.shape
    R = ps.shape[-1]
    B = triplets.shape[0]
    assert B % tile_b == 0, f"batch {B} must be padded to a multiple of {tile_b}"
    n_tiles = B // tile_b
    assert tile_r.shape == (n_tiles,), (tile_r.shape, n_tiles)
    K2 = K * K
    SK, SK2 = S * K, S * K2

    theta_all = jnp.transpose(thetas, (1, 0, 2)).reshape(G, SK)
    group = group or S
    assert S % group == 0, (S, group)
    nb = S // group
    gK, gK2 = group * K, group * K2
    Pm_bd, Pkk_bd = _bdr_params(ps.astype(jnp.float32), group)
    # Selector blocks are identical for every group — pass ONE group's.
    E1, E2, KS, K2S = _bd_selectors(K, group)

    kernel = functools.partial(
        _em_tile_kernel_bdr, k=K, n_samples=S, group=group, strict=strict
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_b, 3), lambda i, tr: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1), lambda i, tr: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, SK), lambda i, tr: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, gK, gK2), lambda i, tr: (tr[i], 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, gK2, gK), lambda i, tr: (tr[i], 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gK, gK2), lambda i, tr: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gK, gK2), lambda i, tr: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gK2, gK), lambda i, tr: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gK2, gK), lambda i, tr: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gK, group), lambda i, tr: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, gK), lambda i, tr: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, gK2), lambda i, tr: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G, SK), lambda i, tr: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SK2, gK), lambda i, tr: (tr[i], 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S), lambda i, tr: (0, 0), memory_space=pltpu.VMEM),
        ],
    )
    theta_hat, cross, ll = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((G, SK), jnp.float32),
            jax.ShapeDtypeStruct((R, SK2, gK), jnp.float32),
            jax.ShapeDtypeStruct((1, S), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (6 * G * SK + 7 * nb * gK2 * gK) // 1,
            bytes_accessed=B * (3 * 4 + 4) + G * SK * 4 * 2,
            transcendentals=B * S,
        ),
        interpret=interpret,
    )(
        tile_r,
        triplets,
        weights[:, None].astype(jnp.float32),
        theta_all.astype(jnp.float32),
        Pm_bd,
        Pkk_bd,
        jnp.asarray(E1),
        jnp.asarray(E2),
        jnp.asarray(E1.T),
        jnp.asarray(E2.T),
        jnp.asarray(KS),
        jnp.asarray(KS.T),
        jnp.asarray(K2S),
    )
    theta_hat = jnp.transpose(theta_hat.reshape(G, S, K), (1, 0, 2))
    # cross is nb row-stacked per-group blocks; within block gi the rows
    # are (s, (k,l)) for s in gi's group and cols (s', m) likewise — take
    # the within-group s == s' diagonal (advanced indexing on the two
    # group axes puts that dim first: [group, R, nb, K2, K]).
    cross6 = cross.reshape(R, nb, group, K2, group, K)
    g_diag = cross6[:, :, jnp.arange(group), :, jnp.arange(group), :]
    s_diag = jnp.transpose(g_diag, (2, 0, 1, 3, 4)).reshape(S, R, K2, K)
    s_stats = jnp.transpose(
        s_diag.reshape(S, R, K, K, K), (0, 2, 3, 4, 1)
    )                                                        # [S, K, K, K, R]
    return theta_hat, s_stats, ll[0, :]


def bdr_em_ensemble_stats(
    thetas: jax.Array,
    ps: jax.Array,
    batch: Batch,
    precision=None,      # signature compatibility; unused
    tile_b: int = DEFAULT_TILE_B,
    group: int = 0,
    interpret: bool | None = None,
    strict: bool = False,
) -> SweepStats:
    """Whole-ensemble fused sweep: bd algebra x rating-sorted x one-hot.

    ``group`` (default S): restart sub-group width for the block-diagonal
    stages — smaller groups cut the quadratic overcompute at the cost of
    more matmul invocations; must divide S.

    Requires ``batch.tile_rating`` and rows in rating_sort_pad order
    (ops/pallas_em_rsorted.rating_sort_pad / apply_rating_sort).
    """
    if batch.tile_rating is None:
        raise ValueError(
            "bdr stats need batch.tile_rating; build with rating_sort_pad "
            "and reorder rows with apply_rating_sort"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    theta_hat, s, ll = _pallas_stats_bdr(
        thetas,
        ps,
        batch.triplets,
        batch.weights,
        batch.tile_rating,
        tile_b=tile_b,
        group=group,
        interpret=interpret,
        strict=strict,
    )
    return SweepStats(theta_hat=theta_hat, p_hat=ps * s, loglik=ll)


bdr_em_ensemble_stats.ensemble = True  # type: ignore[attr-defined]
