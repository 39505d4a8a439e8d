"""bdrg kernel: bdr algebra with restart GROUPS on the Pallas grid.

The bdr kernel (ops/pallas_em_bdr.py) unrolls its restart-group loop in
the tile body, so its Mosaic program and VMEM working set scale with the
whole ensemble: at K>=25 x S=10 the program stops compiling at
production N (deterministic remote-compile 500s, measured 2026-08-20 —
t256/K25/N=131k and every K=50 shape), which is why round 3 capped bdr
at K<=20 and the K-grid band ran the per-restart one-hot kernel with
R-width rating masks (26.2M upd/s at K=50).

Here the group loop moves onto the grid: grid = (nb, n_tiles), and each
grid step runs ONE restart group's block-diagonal algebra over one
rating-pure tile.  Consequences:

- the Mosaic program is per-group-sized — independent of S and of nb —
  so large-K shapes compile where bdr's unrolled body cannot;
- VMEM holds one group's slabs + one group's parameter blocks
  ([G, gK] theta/theta_hat, [gK, gK2] p views), not the ensemble's:
  K=50 fits at g=1-2 where bdr needed ~28 MB;
- the [Bt, G] one-hot gather/scatter matmuls run once per GROUP (nb x
  per sweep) instead of once — the price of grid-streaming; negligible
  where per-group K^3 algebra dominates (K >= ~16), which is exactly the
  band this kernel serves.

Rating-sorted tiles (rows in rating_sort_pad order + Batch.tile_rating)
are required, like bdr: the prefetched tile->rating index picks the
p-operand rating block, so no rating masks and 1/R-width T/A3/cross.

Parity: tests/test_kernel_parity.py (interpret mode).  Measured numbers:
BASELINE.md round-4 K-band table.
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
from trigenicinteractionpredictor_tpu.ops.pallas_em_bdr import _bdr_params

_EPS = 1e-30
DEFAULT_TILE_B = 256


def _em_tile_kernel_bdrg(
    # scalar prefetch
    tile_r_ref,    # int32 [n_tiles]
    # inputs
    trip_ref,      # int32 [Bt, 3]
    w_ref,         # f32  [Bt, 1]
    theta_ref,     # f32  [1, G, gK]       this group's columns (leading
                   #                       group axis: TPU blocks must be
                   #                       full trailing dims or 128-aligned)
    pm_ref,        # f32  [1, 1, gK, gK2]  this (rating, group) block
    pkk_ref,       # f32  [1, 1, gK2, gK]
    e1_ref,        # f32  [gK, gK2]
    e2_ref,        # f32  [gK, gK2]
    e1t_ref,       # f32  [gK2, gK]
    e2t_ref,       # f32  [gK2, gK]
    ks_ref,        # f32  [gK, g]
    kst_ref,       # f32  [g, gK]
    k2s_ref,       # f32  [g, gK2]
    # outputs
    theta_hat_ref,  # f32 [1, G, gK]       this group's accumulator
    cross_ref,      # f32 [1, 1, gK2, gK]  this (rating, group) block
    ll_ref,         # f32 [1, 1, g]        this group's row
    *,
    k: int,
    group: int,
    strict: bool = False,
):
    i = pl.program_id(1)            # tile index (fast axis; resets per group)
    K = k
    Bt = trip_ref.shape[0]
    G = theta_ref.shape[1]
    prec = jax.lax.Precision.HIGHEST if strict else None

    @pl.when(i == 0)
    def _init_group():
        theta_hat_ref[:] = jnp.zeros_like(theta_hat_ref)
        ll_ref[:] = jnp.zeros_like(ll_ref)

    first_of_block = jnp.logical_or(
        i == 0, tile_r_ref[jnp.maximum(i - 1, 0)] != tile_r_ref[i]
    )

    theta = theta_ref[0]
    gene_iota = jax.lax.broadcasted_iota(jnp.int32, (Bt, G), 1)

    def onehot(pos: int):
        return (gene_iota == trip_ref[:, pos][:, None]).astype(jnp.float32)

    oh1, oh2, oh3 = onehot(0), onehot(1), onehot(2)
    th1 = jnp.dot(oh1, theta, preferred_element_type=jnp.float32, precision=prec)
    th2 = jnp.dot(oh2, theta, preferred_element_type=jnp.float32, precision=prec)
    th3 = jnp.dot(oh3, theta, preferred_element_type=jnp.float32, precision=prec)
    w = w_ref[:]

    # One group's block-diagonal algebra (the nb == 1 body of the bdr
    # kernel): every stage is a single matmul at gK/gK2 width.
    T = jnp.dot(
        th3, pm_ref[0, 0], preferred_element_type=jnp.float32, precision=prec
    )
    sp1 = jnp.dot(th1, e1_ref[:], preferred_element_type=jnp.float32, precision=prec)
    sp2 = jnp.dot(th2, e2_ref[:], preferred_element_type=jnp.float32, precision=prec)
    A1 = jnp.dot(T * sp2, e1t_ref[:], preferred_element_type=jnp.float32, precision=prec)
    A2 = jnp.dot(T * sp1, e2t_ref[:], preferred_element_type=jnp.float32, precision=prec)
    W = sp1 * sp2
    A3 = jnp.dot(
        W, pkk_ref[0, 0], preferred_element_type=jnp.float32, precision=prec
    )
    if group == 1:
        # g=1: the ks/kst/k2s "matmuls" would be width-1 MXU passes —
        # maximally latency-bound.  A VPU row-sum + broadcast is free.
        D1 = jnp.sum(th1 * A1, axis=1, keepdims=True)       # [Bt, 1]
        scale = w / (D1 + _EPS)                             # bcast [Bt, 1]
        scale2 = scale
        D = D1
    else:
        D = jnp.dot(
            th1 * A1, ks_ref[:], preferred_element_type=jnp.float32,
            precision=prec,
        )                                                   # [Bt, g]
        scale_g = w / (D + _EPS)                            # [Bt, g]
        scale = jnp.dot(
            scale_g, kst_ref[:], preferred_element_type=jnp.float32,
            precision=prec,
        )                                                   # [Bt, gK]
        scale2 = jnp.dot(
            scale_g, k2s_ref[:], preferred_element_type=jnp.float32,
            precision=prec,
        )                                                   # [Bt, gK2]

    s1 = th1 * A1 * scale
    s2 = th2 * A2 * scale
    s3 = th3 * A3 * scale

    V = W * scale2
    contrib = jnp.dot(
        V.T, th3, preferred_element_type=jnp.float32, precision=prec
    )                                                       # [gK2, gK]

    @pl.when(first_of_block)
    def _set():
        cross_ref[0, 0] = contrib

    @pl.when(jnp.logical_not(first_of_block))
    def _acc():
        cross_ref[0, 0] += contrib

    theta_hat_ref[0] += (
        jnp.dot(oh1.T, s1, preferred_element_type=jnp.float32, precision=prec)
        + jnp.dot(oh2.T, s2, preferred_element_type=jnp.float32, precision=prec)
        + jnp.dot(oh3.T, s3, preferred_element_type=jnp.float32, precision=prec)
    )
    ll_ref[0] += jnp.sum(jnp.log(D + _EPS) * w, axis=0, keepdims=True)


@functools.partial(
    jax.jit, static_argnames=("tile_b", "group", "interpret", "strict")
)
def _pallas_stats_bdrg(
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

    group = group or 1
    assert S % group == 0, (S, group)
    nb = S // group
    gK, gK2 = group * K, group * K2
    # Group axis LEADING: TPU block specs must take full trailing dims (or
    # 128-aligned slices), so theta arrives as [nb, G, gK] and each grid
    # step takes block (1, G, gK) — a column slice of [G, SK] would need
    # gK % 128 == 0, which the K-band widths (50..125) never satisfy.
    theta_g = jnp.transpose(thetas, (1, 0, 2)).reshape(G, nb, gK)
    theta_g = jnp.transpose(theta_g, (1, 0, 2))              # [nb, G, gK]
    Pm_bd, Pkk_bd = _bdr_params(ps.astype(jnp.float32), group)
    E1, E2, KS, K2S = _bd_selectors(K, group)

    kernel = functools.partial(
        _em_tile_kernel_bdrg, k=K, group=group, strict=strict
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, n_tiles),
        in_specs=[
            pl.BlockSpec((tile_b, 3), lambda g, i, tr: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1), lambda g, i, tr: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, gK), lambda g, i, tr: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, gK, gK2), lambda g, i, tr: (tr[i], g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, gK2, gK), lambda g, i, tr: (tr[i], g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gK, gK2), lambda g, i, tr: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gK, gK2), lambda g, i, tr: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gK2, gK), lambda g, i, tr: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gK2, gK), lambda g, i, tr: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gK, group), lambda g, i, tr: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, gK), lambda g, i, tr: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, gK2), lambda g, i, tr: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, G, gK), lambda g, i, tr: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, gK2, gK), lambda g, i, tr: (tr[i], g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, group), lambda g, i, tr: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
    )
    theta_hat, cross, ll = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb, G, gK), jnp.float32),
            jax.ShapeDtypeStruct((R, nb, gK2, gK), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, group), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * nb * (6 * G * gK + 7 * gK2 * gK),
            bytes_accessed=B * nb * (3 * 4 + 4) + G * SK * 4 * 2,
            transcendentals=B * S,
        ),
        interpret=interpret,
    )(
        tile_r,
        triplets,
        weights[:, None].astype(jnp.float32),
        theta_g.astype(jnp.float32),
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
    # [nb, G, gK] -> [G, nb, g, K] -> [S, G, K]
    theta_hat = jnp.transpose(
        theta_hat.reshape(nb, G, group, K), (0, 2, 1, 3)
    ).reshape(S, G, K)
    # cross[r, n] is group n's [gK2, gK] block: rows (s, (k,l)), cols
    # (s', m) within the group — take the within-group s == s' diagonal.
    cross6 = cross.reshape(R, nb, group, K2, group, K)
    g_diag = cross6[:, :, jnp.arange(group), :, jnp.arange(group), :]
    s_diag = jnp.transpose(g_diag, (2, 0, 1, 3, 4)).reshape(S, R, K2, K)
    s_stats = jnp.transpose(
        s_diag.reshape(S, R, K, K, K), (0, 2, 3, 4, 1)
    )                                                        # [S, K, K, K, R]
    return theta_hat, s_stats, ll.reshape(S)


def bdrg_em_ensemble_stats(
    thetas: jax.Array,
    ps: jax.Array,
    batch: Batch,
    precision=None,      # signature compatibility; unused
    tile_b: int = DEFAULT_TILE_B,
    group: int = 0,
    interpret: bool | None = None,
    strict: bool = False,
) -> SweepStats:
    """Whole-ensemble fused sweep with restart groups on the grid.

    ``group`` (default 1): restart sub-group width per grid step; must
    divide S.  Requires ``batch.tile_rating`` + rating_sort_pad row order,
    exactly like the bdr kernel.
    """
    if batch.tile_rating is None:
        raise ValueError(
            "bdrg stats need batch.tile_rating; build with rating_sort_pad "
            "and reorder rows with apply_rating_sort"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    theta_hat, s, ll = _pallas_stats_bdrg(
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


bdrg_em_ensemble_stats.ensemble = True  # type: ignore[attr-defined]
