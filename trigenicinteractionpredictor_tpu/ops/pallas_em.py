"""Fused Pallas TPU kernel for the EM sufficient-statistics sweep.

This is the hand-scheduled version of ops/em.py::em_sufficient_stats
(SURVEY.md §8.2 step 5): one kernel pass over triplet tiles computes the
E-step, both M-step accumulators, and the log-likelihood, with theta, p and
all accumulators resident in VMEM for the whole sweep.  Rationale:

- the XLA path materializes ~a dozen [B, K]-wide intermediates in HBM per
  sweep; here every intermediate lives and dies inside one VMEM tile;
- gathers and scatter-adds become one-hot matmuls on the MXU ([Bt, G] x
  [G, K] and [G, Bt] x [Bt, K]) — random scatter serializes on TPU
  (measured 26x slower than the matmul form on the axon chip);
- it sidesteps the axon XLA-fusion miscompile entirely (ops/em.py notes).

Mosaic constraints shape the implementation: no batched dot_general and no
minor-dimension reshapes, so every contraction is either a plain 2-D matmul
or elementwise-multiply + row-sum, the rating select is a static slice per
rating class (R is 2-3), and the K <-> K^2 index bookkeeping runs through
constant 0/1 selector matrices E1[K, K^2] (spread k over (k,l)) and
E2[K, K^2] (spread l over (k,l)):

    W  = (th1 @ E1) * (th2 @ E2)              # theta1 x theta2 outer, [Bt, K^2]
    A1 = (T * (th2 @ E2)) @ E1.T              # sum over l of T[b,(k,l)] th2[b,l]
    A2 = (T * (th1 @ E1)) @ E2.T              # sum over k of T[b,(k,l)] th1[b,k]

Memory budget per grid step (defaults Bt=512, G<=~3000, K<=~32): theta
[G,K] + p views + one-hot [Bt,G] + accumulators — all f32, comfortably
inside the ~16 MB VMEM budget at Kuzmin scale (G ~ 1.3k, K = 10).

Numerically interchangeable with the jnp path (tests/test_kernel_parity.py
runs interpret mode on CPU; utils/integrity.py re-checks on hardware).
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

_EPS = 1e-30
DEFAULT_TILE_B = 512


def _selectors(k: int) -> Tuple[np.ndarray, np.ndarray]:
    """E1[k', (k,l)] = d_{k k'};  E2[l', (k,l)] = d_{l l'}  (f32 0/1)."""
    kl = np.arange(k * k)
    e1 = (kl // k == np.arange(k)[:, None]).astype(np.float32)
    e2 = (kl % k == np.arange(k)[:, None]).astype(np.float32)
    return e1, e2


def _em_tile_kernel(
    # inputs
    trip_ref,      # int32 [Bt, 3]
    r_ref,         # int32 [Bt, 1]
    w_ref,         # f32  [Bt, 1]
    theta_ref,     # f32  [G, S*K]      restarts stacked along columns
    p_m_ref,       # f32  [S*K, R*K*K]  rows (s, m); columns (r, k, l)
    p_kk_ref,      # f32  [S*K*K, R*K]  rows (s, k, l); columns (r, m)
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
    """One triplet tile for an ensemble of S restarts.

    The expensive [Bt, G]-shaped one-hot matmuls (gather + scatter-add) run
    ONCE for the whole ensemble with S*K output lanes — ensemble width is
    nearly free on the MXU, which is exactly the reference's serial
    "samples" loop turned into hardware lanes (SURVEY.md §3.3 EP).
    """
    i = pl.program_id(0)
    K, R, S = k, n_ratings, n_samples
    Bt = trip_ref.shape[0]
    G = theta_ref.shape[0]
    K2 = K * K
    # strict: HIGHEST on every MXU matmul (f32 operand passes) so the EM
    # monotone-likelihood invariant holds on-chip; fast (default) keeps the
    # DEFAULT bf16 passes (BASELINE.md numerics note).
    prec = jax.lax.Precision.HIGHEST if strict else None

    @pl.when(i == 0)
    def _init():
        theta_hat_ref[:] = jnp.zeros_like(theta_hat_ref)
        s_ref[:] = jnp.zeros_like(s_ref)
        for s in range(S):
            ll_ref[s, 0] = 0.0

    theta = theta_ref[:]
    gene_iota = jax.lax.broadcasted_iota(jnp.int32, (Bt, G), 1)

    def onehot(pos: int):
        return (gene_iota == trip_ref[:, pos][:, None]).astype(jnp.float32)

    # Shared across the ensemble: triplet one-hots and the rating one-hot.
    oh1, oh2, oh3 = onehot(0), onehot(1), onehot(2)
    th1_all = jnp.dot(oh1, theta, preferred_element_type=jnp.float32, precision=prec)
    th2_all = jnp.dot(oh2, theta, preferred_element_type=jnp.float32, precision=prec)
    th3_all = jnp.dot(oh3, theta, preferred_element_type=jnp.float32, precision=prec)
    r_onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (Bt, R), 1) == r_ref[:, 0][:, None]
    ).astype(jnp.float32)
    w = w_ref[:]                                                   # [Bt, 1]
    e1, e2 = e1_ref[:], e2_ref[:]

    # Per-restart [Bt, K]-wide algebra (static S loop; K^3-scale matmuls).
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
        D = jnp.sum(th1 * A1, axis=1, keepdims=True)               # [Bt, 1]

        W = th1_spread * th2_spread                                # [Bt, K^2]
        A3_all = jnp.dot(
            W, p_kk_ref[s * K2 : (s + 1) * K2, :],
            preferred_element_type=jnp.float32, precision=prec,
        )
        A3 = jnp.zeros((Bt, K), jnp.float32)
        for rr in range(R):
            A3 += A3_all[:, rr * K : (rr + 1) * K] * r_onehot[:, rr : rr + 1]

        scale = w / (D + _EPS)                                     # [Bt, 1]
        s_tiles.append((th1 * A1 * scale, th2 * A2 * scale, th3 * A3 * scale))

        # p accumulator for restart s.
        V = W * scale
        th3r = jnp.concatenate(
            [th3 * r_onehot[:, rr : rr + 1] for rr in range(R)], axis=1
        )
        s_ref[s * K2 : (s + 1) * K2, :] += jnp.dot(
            V.T, th3r, preferred_element_type=jnp.float32, precision=prec
        )
        ll_parts.append(jnp.sum(w * jnp.log(D + _EPS)))

    # theta scatter-add: ONE trio of [G, Bt] x [Bt, S*K] matmuls for the
    # whole ensemble (restart streams re-stacked along columns).
    s1_all = jnp.concatenate([t[0] for t in s_tiles], axis=1)
    s2_all = jnp.concatenate([t[1] for t in s_tiles], axis=1)
    s3_all = jnp.concatenate([t[2] for t in s_tiles], axis=1)
    theta_hat_ref[:] += (
        jnp.dot(oh1.T, s1_all, preferred_element_type=jnp.float32, precision=prec)
        + jnp.dot(oh2.T, s2_all, preferred_element_type=jnp.float32, precision=prec)
        + jnp.dot(oh3.T, s3_all, preferred_element_type=jnp.float32, precision=prec)
    )
    for s in range(S):
        ll_ref[s, 0] += ll_parts[s]


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret", "strict"))
def _pallas_stats(
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

    # Restarts stacked along columns/rows; the rating class is the MAJOR
    # column block (static slices in-kernel; Mosaic cannot split minor dims).
    theta_all = jnp.transpose(thetas, (1, 0, 2)).reshape(G, S * K)
    p_m = jnp.transpose(ps, (0, 3, 4, 1, 2)).reshape(S * K, R * K * K)
    p_kk = jnp.transpose(ps, (0, 1, 2, 4, 3)).reshape(S * K * K, R * K)
    e1_np, e2_np = _selectors(K)
    e1, e2 = jnp.asarray(e1_np), jnp.asarray(e2_np)

    kernel = functools.partial(
        _em_tile_kernel, k=K, n_ratings=R, n_samples=S, strict=strict
    )
    theta_hat, s, ll = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_b, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, S * K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S * K, R * K * K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S * K * K, R * K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, K * K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, K * K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G, S * K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S * K * K, R * K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, S * K), jnp.float32),
            jax.ShapeDtypeStruct((S * K * K, R * K), jnp.float32),
            jax.ShapeDtypeStruct((S, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (6 * G * S * K + S * 3 * K * K * K * R),
            bytes_accessed=B * (3 * 4 + 4 + 4) + G * S * K * 4 * 2,
            transcendentals=B * S,
        ),
        interpret=interpret,
    )(
        triplets,
        ratings[:, None],
        weights[:, None].astype(jnp.float32),
        theta_all.astype(jnp.float32),
        p_m.astype(jnp.float32),
        p_kk.astype(jnp.float32),
        e1,
        e2,
    )
    # Back to stacked layouts: [S, G, K], [S, K, K, K, R], [S].
    theta_hat = jnp.transpose(theta_hat.reshape(G, S, K), (1, 0, 2))
    s = jnp.transpose(s.reshape(S, K, K, R, K), (0, 1, 2, 4, 3))
    return theta_hat, s, ll[:, 0]


def pallas_em_sufficient_stats(
    theta: jax.Array,
    p: jax.Array,
    batch: Batch,
    precision=None,  # signature-compatible with em_sufficient_stats; unused
    tile_b: int = DEFAULT_TILE_B,
    interpret: bool | None = None,
    strict: bool = False,
) -> SweepStats:
    """Drop-in replacement for ops.em.em_sufficient_stats (Pallas path).

    Single-restart view of the ensemble kernel (S=1).  ``interpret``
    defaults to True off-TPU so CPU tests exercise the same kernel logic.
    """
    out = pallas_em_ensemble_stats(
        theta[None], p[None], batch, tile_b=tile_b, interpret=interpret,
        strict=strict,
    )
    return SweepStats(
        theta_hat=out.theta_hat[0], p_hat=out.p_hat[0], loglik=out.loglik[0]
    )


def pallas_em_ensemble_stats(
    thetas: jax.Array,   # [S, G, K]
    ps: jax.Array,       # [S, K, K, K, R]
    batch: Batch,
    precision=None,      # signature compatibility; unused
    tile_b: int = DEFAULT_TILE_B,
    interpret: bool | None = None,
    strict: bool = False,
) -> SweepStats:
    """Whole-ensemble fused sweep: S restarts share the one-hot matmuls.

    The reference runs restarts serially (SURVEY.md §4.1); the jnp path
    vmaps them (S x cost); here ensemble width rides the MXU lane dimension
    so S restarts cost barely more than one.  Returns SweepStats with a
    leading [S] axis on every field.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    theta_hat, s, ll = _pallas_stats(
        thetas,
        ps,
        batch.triplets,
        batch.ratings,
        batch.weights,
        tile_b=tile_b,
        interpret=interpret,
        strict=strict,
    )
    p_hat = ps * s
    return SweepStats(theta_hat=theta_hat, p_hat=p_hat, loglik=ll)


# Marker for parallel/sharded_em.py: call once with stacked states instead
# of vmapping per restart.
pallas_em_ensemble_stats.ensemble = True  # type: ignore[attr-defined]
