"""Hybrid Pallas EM kernel: XLA row-gather in, one-hot scatter out.

The lane-stacked one-hot kernel (ops/pallas_em.py) spends ~6*G*S*K MXU
FLOPs per triplet row on one-hot matmuls — three to gather theta rows and
three to scatter the position marginals back — which at Kuzmin scale
(G ~ 10^3) is ~10x the useful EM math (VERDICT round 2, missing #3: ~98%
of MXU work is O(G) overhead).  The gather half of that cost is pure
waste: dynamic ROW GATHERS are cheap memory-bound ops on TPU (it is the
scatter that measured 26x slower than its matmul form on the axon chip,
see ops/pallas_em.py docstring).  This kernel therefore:

1. gathers th1/th2/th3 = theta_all[triplets[:, pos]] with plain XLA
   ``jnp.take`` outside the kernel (like ops/pallas_em_large.py stage 1);
2. runs the same fused factorized E-step + p-stats tile body;
3. keeps the theta_hat scatter INSIDE the kernel as one-hot matmuls into
   a VMEM-resident [G, S*K] accumulator (like ops/pallas_em.py), so the
   position-marginal streams never round-trip through HBM and no
   host-side scatter plan is needed.

Net: the three [Bt, G] gather matmuls and half the one-hot construction
disappear, the G VMEM ceiling roughly doubles (only the scatter one-hots
remain G-sized), and the batch dataflow is unchanged — a drop-in
``stats_fn`` for parallel/sharded_em.py with the same SweepStats contract.

Parity: tests/test_kernel_parity.py (interpret mode on CPU) checks this
path against the jnp reference; dispatch (ops/dispatch.py) races it by
measured speed on the real chip (BASELINE.md path-vs-shape table).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trigenicinteractionpredictor_tpu.ops.em import Batch, SweepStats
from trigenicinteractionpredictor_tpu.ops.pallas_em import _selectors

_EPS = 1e-30
DEFAULT_TILE_B = 512


def _em_tile_kernel_hybrid(
    # inputs
    trip_ref,      # int32 [Bt, 3]  (scatter one-hots only)
    th1_ref,       # f32 [Bt, S*K]  pre-gathered theta rows
    th2_ref,       # f32 [Bt, S*K]
    th3_ref,       # f32 [Bt, S*K]
    r_ref,         # int32 [Bt, 1]
    w_ref,         # f32  [Bt, 1]
    p_m_ref,       # f32  [S*K, R*K*K]
    p_kk_ref,      # f32  [S*K*K, R*K]
    e1_ref,        # f32  [K, K*K]
    e2_ref,        # f32  [K, K*K]
    # outputs (constant index maps -> VMEM accumulators across the grid)
    theta_hat_ref,  # f32 [G, S*K]
    s_ref,          # f32 [S*K*K, R*K]
    ll_ref,         # f32 [S, 1] in SMEM
    *,
    k: int,
    n_ratings: int,
    n_samples: int,
    strict: bool = False,
):
    """One pre-gathered triplet tile; scatter-add stays on the MXU.

    Same factorized algebra as ops/pallas_em.py::_em_tile_kernel (see that
    docstring for the E1/E2 selector trick); only the theta gather moved
    out of the kernel.
    """
    i = pl.program_id(0)
    K, R, S = k, n_ratings, n_samples
    Bt = r_ref.shape[0]
    G = theta_hat_ref.shape[0]
    K2 = K * K
    # strict: HIGHEST on every MXU matmul (on-chip monotone-L mode).
    prec = jax.lax.Precision.HIGHEST if strict else None

    @pl.when(i == 0)
    def _init():
        theta_hat_ref[:] = jnp.zeros_like(theta_hat_ref)
        s_ref[:] = jnp.zeros_like(s_ref)
        for s in range(S):
            ll_ref[s, 0] = 0.0

    r_onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (Bt, R), 1) == r_ref[:, 0][:, None]
    ).astype(jnp.float32)
    w = w_ref[:]
    e1, e2 = e1_ref[:], e2_ref[:]
    th1_all, th2_all, th3_all = th1_ref[:], th2_ref[:], th3_ref[:]

    s_tiles = []
    ll_parts = []
    for s in range(S):
        sl = slice(s * K, (s + 1) * K)
        th1, th2, th3 = th1_all[:, sl], th2_all[:, sl], th3_all[:, sl]

        # T[b,(k,l)] = sum_m th3[b,m] p_s[k,l,m,r_b]
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
        s_tiles.append((th1 * A1 * scale, th2 * A2 * scale, th3 * A3 * scale))

        V = W * scale
        th3r = jnp.concatenate(
            [th3 * r_onehot[:, rr : rr + 1] for rr in range(R)], axis=1
        )
        s_ref[s * K2 : (s + 1) * K2, :] += jnp.dot(
            V.T, th3r, preferred_element_type=jnp.float32, precision=prec
        )
        ll_parts.append(jnp.sum(w * jnp.log(D + _EPS)))

    # theta scatter-add: the one place a one-hot matmul is genuinely the
    # right TPU idiom (random scatter serializes).  One trio of
    # [G, Bt] x [Bt, S*K] matmuls for the whole ensemble.
    gene_iota = jax.lax.broadcasted_iota(jnp.int32, (Bt, G), 1)

    def onehot(pos: int):
        return (gene_iota == trip_ref[:, pos][:, None]).astype(jnp.float32)

    s1_all = jnp.concatenate([t[0] for t in s_tiles], axis=1)
    s2_all = jnp.concatenate([t[1] for t in s_tiles], axis=1)
    s3_all = jnp.concatenate([t[2] for t in s_tiles], axis=1)
    theta_hat_ref[:] += (
        jnp.dot(onehot(0).T, s1_all, preferred_element_type=jnp.float32, precision=prec)
        + jnp.dot(onehot(1).T, s2_all, preferred_element_type=jnp.float32, precision=prec)
        + jnp.dot(onehot(2).T, s3_all, preferred_element_type=jnp.float32, precision=prec)
    )
    for s in range(S):
        ll_ref[s, 0] += ll_parts[s]


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret", "strict"))
def _pallas_stats_hybrid(
    thetas: jax.Array,   # [S, G, K]
    ps: jax.Array,       # [S, K, K, K, R]
    triplets: jax.Array,
    ratings: jax.Array,
    weights: jax.Array,
    tile_b: int = DEFAULT_TILE_B,
    interpret: bool = False,
    strict: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    S, G, K = thetas.shape
    R = ps.shape[-1]
    B = triplets.shape[0]
    assert B % tile_b == 0, f"batch {B} must be padded to a multiple of {tile_b}"
    n_tiles = B // tile_b
    SK = S * K

    theta_all = jnp.transpose(thetas, (1, 0, 2)).reshape(G, SK)
    p_m = jnp.transpose(ps, (0, 3, 4, 1, 2)).reshape(SK, R * K * K)
    p_kk = jnp.transpose(ps, (0, 1, 2, 4, 3)).reshape(S * K * K, R * K)
    e1_np, e2_np = _selectors(K)
    e1, e2 = jnp.asarray(e1_np), jnp.asarray(e2_np)

    # Stage 1: XLA row gathers (memory-bound; see module docstring).
    th1 = jnp.take(theta_all, triplets[:, 0], axis=0)
    th2 = jnp.take(theta_all, triplets[:, 1], axis=0)
    th3 = jnp.take(theta_all, triplets[:, 2], axis=0)

    kernel = functools.partial(
        _em_tile_kernel_hybrid, k=K, n_ratings=R, n_samples=S, strict=strict
    )
    tile_spec = lambda w: pl.BlockSpec(  # noqa: E731
        (tile_b, w), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    full_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    theta_hat, s, ll = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            tile_spec(3),
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
            full_spec((G, SK)),
            full_spec((S * K * K, R * K)),
            pl.BlockSpec((S, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, SK), jnp.float32),
            jax.ShapeDtypeStruct((S * K * K, R * K), jnp.float32),
            jax.ShapeDtypeStruct((S, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (3 * G * SK + S * 3 * K * K * K * R),
            bytes_accessed=B * SK * 4 * 3 + B * (3 * 4 + 4 + 4) + G * SK * 4 * 2,
            transcendentals=B * S,
        ),
        interpret=interpret,
    )(
        triplets,
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
    theta_hat = jnp.transpose(theta_hat.reshape(G, S, K), (1, 0, 2))
    s = jnp.transpose(s.reshape(S, K, K, R, K), (0, 1, 2, 4, 3))
    return theta_hat, s, ll[:, 0]


def hybrid_em_ensemble_stats(
    thetas: jax.Array,   # [S, G, K]
    ps: jax.Array,       # [S, K, K, K, R]
    batch: Batch,
    precision=None,      # signature compatibility; unused
    tile_b: int = DEFAULT_TILE_B,
    interpret: bool | None = None,
    strict: bool = False,
) -> SweepStats:
    """Whole-ensemble fused sweep, XLA-gather variant (SweepStats, [S] axes)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    theta_hat, s, ll = _pallas_stats_hybrid(
        thetas,
        ps,
        batch.triplets,
        batch.ratings,
        batch.weights,
        tile_b=tile_b,
        interpret=interpret,
        strict=strict,
    )
    return SweepStats(theta_hat=theta_hat, p_hat=ps * s, loglik=ll)


hybrid_em_ensemble_stats.ensemble = True  # type: ignore[attr-defined]
