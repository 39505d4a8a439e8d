"""Block-diagonal ensemble EM kernel: restart-batched MXU algebra.

Round-3 on-chip measurement (tools/kernel_race.py, BASELINE.md roofline)
overturned the round-2 overhead model: at the G=1000/K=10/S=10 headline
shape the one-hot kernel's SIX [Bt, G] gather/scatter matmuls are nearly
free (well-shaped MXU passes), and what actually bounds the sweep is the
per-restart loop in the tile body — ~7 tiny K^2-scale matmuls per restart
per tile, each latency-bound at K=10 (contraction/output dims of 10-200
against a 128x128 systolic array), so ensemble width costs ~linear time
despite the lane-stacking.  Evidence: dropping the three gather matmuls
(ops/pallas_em_hybrid.py) made the kernel SLOWER (148M vs 162M updates/s),
and the plan path with no G-sized matmuls at all is slower still (113M).

This kernel replaces the per-restart loop with ensemble-wide matmuls
against BLOCK-DIAGONAL operands, trading an S-fold FLOP overcompute for
invocation count: S restarts ride one matmul per algebra stage.

    T_all   = th3_all @ P_m_bd        # [Bt, R*S*K^2]; P_m_bd [SK, R*SK2]
    spread1 = th1_all @ E1_bd         # [Bt, S*K^2];   E1_bd  [SK, SK2]
    A1      = (T * spread2) @ E1T_bd  # [Bt, SK]
    A3_all  = W @ P_kk_bd             # [Bt, R*SK]
    cross   = V.T @ th3r              # [SK2, R*SK] — p-stats, ALL restarts

where every *_bd matrix carries e1/e2/p blocks on its (s, s) diagonal and
zeros elsewhere (built once per sweep in XLA for p, statically for e1/e2).
The p-stat "cross" matmul computes S^2 restart pairs and keeps only the
diagonal — extracted OUTSIDE the kernel by XLA at negligible cost — which
is exactly the MXU-friendly trade: [SK2, Bt] x [Bt, R*SK] is one large
matmul instead of S tiny outer products.  Total overcompute is ~S x the
useful EM FLOPs, but the MXU runs it in ~7 large passes per tile instead
of ~7*S latency-bound ones.

The kernel takes PRE-GATHERED theta tiles (XLA row-take, like
ops/pallas_em_large.py stage 1) and emits the position-marginal streams
for the sorted-block scatter kernel (stage 3 there), so no buffer scales
with G — the path works at any gene count.  VMEM is dominated by the
[Bt, S*K^2] slabs, so the tile shrinks as S*K^2 grows (ops/dispatch.py
bd_kernel_fits).

Parity: tests/test_kernel_parity.py + tests/test_pallas_large.py cover
interpret mode; utils/integrity.py re-checks on hardware.
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
from trigenicinteractionpredictor_tpu.ops.pallas_em import _selectors

_EPS = 1e-30
DEFAULT_TILE_B = 256


def _bd_selectors(k: int, s: int) -> Tuple[np.ndarray, ...]:
    """Static block-diagonal selector matrices for an S-restart ensemble.

    E1_bd [SK, SK2] spreads theta's k lane over that restart's (k, l)
    columns; E2_bd spreads l; their transposes contract back; KS [SK, S]
    sums each restart's K lanes; K2S [S, SK2] broadcasts a per-restart
    scalar over its K^2 columns.
    """
    e1, e2 = _selectors(k)                     # [K, K2]
    k2 = k * k
    E1 = np.zeros((s * k, s * k2), np.float32)
    E2 = np.zeros_like(E1)
    for i in range(s):
        E1[i * k : (i + 1) * k, i * k2 : (i + 1) * k2] = e1
        E2[i * k : (i + 1) * k, i * k2 : (i + 1) * k2] = e2
    KS = np.zeros((s * k, s), np.float32)
    for i in range(s):
        KS[i * k : (i + 1) * k, i] = 1.0
    K2S = np.zeros((s, s * k2), np.float32)
    for i in range(s):
        K2S[i, i * k2 : (i + 1) * k2] = 1.0
    return E1, E2, KS, K2S


def _bd_params(ps: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Block-diagonal p views, rebuilt in XLA each sweep (p is tiny).

    P_m_bd  [SK, R*SK2]: rows (s, m); columns (r, s', (k, l)); zero off
    the s == s' diagonal.
    P_kk_bd [SK2, R*SK]: rows (s, k, l); columns (r, s', m).
    """
    S, K = ps.shape[0], ps.shape[1]
    R = ps.shape[-1]
    K2 = K * K
    # [S, R, K2, K] view: p[s, k, l, m, r] -> (s, r, (k,l), m)
    p_rklm = jnp.transpose(ps, (0, 4, 1, 2, 3)).reshape(S, R, K2, K)
    eye = jnp.eye(S, dtype=ps.dtype)
    # P_m_bd[(s,m), (r, s', kl)] = p_rklm[s', r, kl, m] * eye[s, s']
    pm = jnp.einsum("srcm,st->tmrsc", p_rklm, eye)     # [S', m, r, s, kl]
    P_m_bd = pm.reshape(S * K, R * S * K2)
    # P_kk_bd[(s,kl), (r, s', m)] = p_rklm[s, r, kl, m] * eye[s, s']
    pk = jnp.einsum("srcm,st->scrtm", p_rklm, eye)     # [s, kl, r, s', m]
    P_kk_bd = pk.reshape(S * K2, R * S * K)
    return P_m_bd, P_kk_bd


def _em_tile_kernel_bd(
    # inputs
    th1_ref,       # f32 [Bt, S*K]
    th2_ref,       # f32 [Bt, S*K]
    th3_ref,       # f32 [Bt, S*K]
    r_ref,         # int32 [Bt, 1]
    w_ref,         # f32  [Bt, 1]
    pm_ref,        # f32  [S*K, R*S*K2]   block-diag
    pkk_ref,       # f32  [S*K2, R*S*K]   block-diag
    e1_ref,        # f32  [S*K, S*K2]     block-diag
    e2_ref,        # f32  [S*K, S*K2]
    e1t_ref,       # f32  [S*K2, S*K]
    e2t_ref,       # f32  [S*K2, S*K]
    ks_ref,        # f32  [S*K, S]
    k2s_ref,       # f32  [S, S*K2]
    # outputs
    s1_ref,        # f32 [Bt, S*K] — per-tile write (scatter stage input)
    s2_ref,        # f32 [Bt, S*K]
    s3_ref,        # f32 [Bt, S*K]
    cross_ref,     # f32 [S*K2, R*S*K] — VMEM accumulator (diag = p stats)
    ll_ref,        # f32 [1, S] — VMEM row accumulator (SMEM scalar writes
                   # from lane-sliced column sums crash the Mosaic compile;
                   # bisected on-chip 2026-08-20)
    *,
    k: int,
    n_ratings: int,
    n_samples: int,
    strict: bool = False,
):
    """One pre-gathered tile, whole ensemble per matmul (no S loop)."""
    # strict: HIGHEST on every MXU matmul (on-chip monotone-L mode).
    prec = jax.lax.Precision.HIGHEST if strict else None
    i = pl.program_id(0)
    K, R, S = k, n_ratings, n_samples
    Bt = r_ref.shape[0]
    SK = S * K
    SK2 = S * K * K

    @pl.when(i == 0)
    def _init():
        cross_ref[:] = jnp.zeros_like(cross_ref)
        ll_ref[:] = jnp.zeros_like(ll_ref)

    r_onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (Bt, R), 1) == r_ref[:, 0][:, None]
    ).astype(jnp.float32)
    w = w_ref[:]
    th1_all, th2_all, th3_all = th1_ref[:], th2_ref[:], th3_ref[:]

    # T[b, (s,k,l)] = sum_m th3[b,(s,m)] p_s[k,l,m,r_b]
    T_all = jnp.dot(th3_all, pm_ref[:], preferred_element_type=jnp.float32, precision=prec)
    T = jnp.zeros((Bt, SK2), jnp.float32)
    for rr in range(R):
        T += T_all[:, rr * SK2 : (rr + 1) * SK2] * r_onehot[:, rr : rr + 1]

    spread1 = jnp.dot(th1_all, e1_ref[:], preferred_element_type=jnp.float32, precision=prec)
    spread2 = jnp.dot(th2_all, e2_ref[:], preferred_element_type=jnp.float32, precision=prec)

    A1 = jnp.dot(T * spread2, e1t_ref[:], preferred_element_type=jnp.float32, precision=prec)
    A2 = jnp.dot(T * spread1, e2t_ref[:], preferred_element_type=jnp.float32, precision=prec)

    # Per-restart denominators and scales, ensemble-wide.
    # Precision note (measured on-chip 2026-08-20): with the MXU's DEFAULT
    # bf16 operand passes the 60-sweep likelihood trace shows max drops of
    # ~3e-4 relative (-37 nats at |L| ~ 9e4) — the same envelope as the
    # one-hot incumbent (-41 nats), i.e. pre-existing on-chip numerics,
    # not a bd regression; exact monotonicity holds in f32 (CPU tests).
    # Forcing HIGHEST on the scale-chain matmuls only shrank the drop to
    # -28 nats while costing 30% throughput (4.35 vs 3.34 ms/sweep), so
    # DEFAULT stays.
    Dsum = jnp.dot(
        th1_all * A1, ks_ref[:], preferred_element_type=jnp.float32, precision=prec,
    )                                                       # [Bt, S]
    scale_S = w / (Dsum + _EPS)                             # [Bt, S]
    scale = jnp.dot(
        scale_S, ks_ref[:].T, preferred_element_type=jnp.float32, precision=prec
    )                                                       # [Bt, SK]

    W = spread1 * spread2                                   # [Bt, SK2]
    A3_all = jnp.dot(W, pkk_ref[:], preferred_element_type=jnp.float32, precision=prec)
    A3 = jnp.zeros((Bt, SK), jnp.float32)
    for rr in range(R):
        A3 += A3_all[:, rr * SK : (rr + 1) * SK] * r_onehot[:, rr : rr + 1]

    s1_ref[:] = th1_all * A1 * scale
    s2_ref[:] = th2_all * A2 * scale
    s3_ref[:] = th3_all * A3 * scale

    # p statistics: ONE cross matmul for the whole ensemble; only the
    # s == s' diagonal blocks are the wanted stats (XLA extracts outside).
    scale2 = jnp.dot(scale_S, k2s_ref[:], preferred_element_type=jnp.float32, precision=prec)                                                       # [Bt, SK2]
    V = W * scale2
    th3r_parts = []
    for rr in range(R):
        th3r_parts.append(th3_all * r_onehot[:, rr : rr + 1])
    th3r = jnp.concatenate(th3r_parts, axis=1)              # [Bt, R*SK]
    cross_ref[:] += jnp.dot(
        V.T, th3r, preferred_element_type=jnp.float32, precision=prec
    )

    ll_tile = jnp.log(Dsum + _EPS) * w                      # [Bt, S]
    ll_ref[:] += jnp.sum(ll_tile, axis=0, keepdims=True)    # [1, S]


@functools.partial(
    jax.jit, static_argnames=("tile_b", "interpret", "strict")
)
def _bd_estep(
    thetas: jax.Array,    # [S, G, K]
    ps: jax.Array,        # [S, K, K, K, R]
    triplets: jax.Array,  # int32 [B, 3]
    ratings: jax.Array,
    weights: jax.Array,
    tile_b: int,
    interpret: bool = False,
    strict: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Gather + block-diag fused E-step.  Returns (s_streams [3, B, SK],
    p-stat s factor [S,K,K,K,R], ll [S])."""
    S, G, K = thetas.shape
    R = ps.shape[-1]
    B = triplets.shape[0]
    assert B % tile_b == 0, f"batch {B} must be padded to a multiple of {tile_b}"
    n_tiles = B // tile_b
    SK, K2 = S * K, K * K
    SK2 = S * K2

    theta_all = jnp.transpose(thetas, (1, 0, 2)).reshape(G, SK)
    P_m_bd, P_kk_bd = _bd_params(ps.astype(jnp.float32))
    E1, E2, KS, K2S = _bd_selectors(K, S)

    th1 = jnp.take(theta_all, triplets[:, 0], axis=0)
    th2 = jnp.take(theta_all, triplets[:, 1], axis=0)
    th3 = jnp.take(theta_all, triplets[:, 2], axis=0)

    kernel = functools.partial(
        _em_tile_kernel_bd, k=K, n_ratings=R, n_samples=S, strict=strict
    )
    tile_spec = lambda w_: pl.BlockSpec(  # noqa: E731
        (tile_b, w_), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    full_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    s1, s2, s3, cross, ll = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            tile_spec(SK),
            tile_spec(SK),
            tile_spec(SK),
            tile_spec(1),
            tile_spec(1),
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
            tile_spec(SK),
            tile_spec(SK),
            tile_spec(SK),
            full_spec((SK2, R * SK)),
            full_spec((1, S)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, SK), jnp.float32),
            jax.ShapeDtypeStruct((B, SK), jnp.float32),
            jax.ShapeDtypeStruct((B, SK), jnp.float32),
            jax.ShapeDtypeStruct((SK2, R * SK), jnp.float32),
            jax.ShapeDtypeStruct((1, S), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            # ~7 ensemble-wide matmuls: T_all + A3 (R*SK2*SK each), spreads
            # + A1/A2 (SK2*SK each), cross (R*SK*SK2).
            flops=2 * B * SK * SK2 * (3 * R + 4),
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
        P_m_bd,
        P_kk_bd,
        jnp.asarray(E1),
        jnp.asarray(E2),
        jnp.asarray(E1.T),
        jnp.asarray(E2.T),
        jnp.asarray(KS),
        jnp.asarray(K2S),
    )
    # Extract the diagonal restart blocks of the cross matmul: rows (s,k,l),
    # columns (r, s', m) -> wanted stats live at s' == s.
    cross5 = cross.reshape(S, K2, R, S, K)
    s_diag = cross5[jnp.arange(S), :, :, jnp.arange(S), :]  # [S, K2, R, K]
    s_stats = jnp.transpose(
        s_diag.reshape(S, K, K, R, K), (0, 1, 2, 4, 3)
    )                                                       # [S, K, K, K, R]
    return jnp.stack([s1, s2, s3]), s_stats, ll[0, :]


def bd_em_ensemble_stats(
    thetas: jax.Array,
    ps: jax.Array,
    batch: Batch,
    precision=None,          # signature compatibility; unused
    tile_b: int = DEFAULT_TILE_B,
    wb: int = 512,
    n_blocks: int = 0,
    interpret: bool | None = None,
    strict: bool = False,
) -> SweepStats:
    """Whole-ensemble fused sweep, block-diagonal MXU algebra (any G).

    Requires ``batch`` to carry a ScatterPlan (Batch.scatter_*) built by
    ops.pallas_em_large.make_scatter_plan with tile == the SCATTER tile
    (plan tile and this kernel's tile_b are independent; the trainer uses
    the same value for both).
    """
    if batch.scatter_perm is None:
        raise ValueError(
            "bd stats need a scatter plan on the batch; build one with "
            "make_scatter_plan(...) and attach via Batch(scatter_perm=...)"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    S, G, K = thetas.shape
    SK = S * K
    streams, s_stats, ll = _bd_estep(
        thetas,
        ps,
        batch.triplets,
        batch.ratings,
        batch.weights,
        tile_b=tile_b,
        interpret=interpret,
        strict=strict,
    )
    theta_hat = _plan_scatter(
        streams, batch.scatter_perm, batch.scatter_lid, batch.scatter_block,
        wb=wb, n_blocks=n_blocks, g=G, interpret=interpret,
    )
    theta_hat = jnp.transpose(theta_hat[:G].reshape(G, S, K), (1, 0, 2))
    return SweepStats(theta_hat=theta_hat, p_hat=ps * s_stats, loglik=ll)


@functools.partial(jax.jit, static_argnames=("wb", "n_blocks", "g", "interpret"))
def _plan_scatter(
    streams: jax.Array,   # [P, B, SK] — P positional value streams
    perm: jax.Array,
    lid: jax.Array,
    block: jax.Array,
    wb: int,
    n_blocks: int,
    g: int,
    interpret: bool = False,
) -> jax.Array:
    """Sorted-block scatter (stage 3 of ops/pallas_em_large.py) reused for
    the bd path's position-marginal streams."""
    from trigenicinteractionpredictor_tpu.ops.pallas_em_large import (
        _scatter_tile_kernel,
    )

    P, B, SK = streams.shape
    Lp = perm.shape[0]
    n_tiles = block.shape[0]
    tile = Lp // n_tiles
    s_stream = streams.reshape(P * B, SK)
    vals = jnp.take(s_stream, perm, axis=0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (tile, 1), lambda i, blk: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile, SK), lambda i, blk: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (wb, SK), lambda i, blk: (blk[i], 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        functools.partial(_scatter_tile_kernel, wb=wb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * wb, SK), jnp.float32),
        interpret=interpret,
    )(block, lid[:, None], vals)


bd_em_ensemble_stats.ensemble = True  # type: ignore[attr-defined]
