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
    theta_ref,     # f32  [G, K]        (whole array, VMEM-resident)
    p_m_ref,       # f32  [K, R*K*K]    columns ordered (r, k, l)
    p_kk_ref,      # f32  [K*K, R*K]    columns ordered (r, m)
    e1_ref,        # f32  [K, K*K]
    e2_ref,        # f32  [K, K*K]
    # outputs (constant index maps -> VMEM accumulators across the grid)
    theta_hat_ref,  # f32 [G, K]
    s_ref,          # f32 [K*K, R*K]    columns ordered (r, m)
    ll_ref,         # f32 [1, 1] in SMEM
    *,
    k: int,
    n_ratings: int,
):
    i = pl.program_id(0)
    K, R = k, n_ratings
    Bt = trip_ref.shape[0]
    G = theta_ref.shape[0]
    K2 = K * K

    @pl.when(i == 0)
    def _init():
        theta_hat_ref[:] = jnp.zeros_like(theta_hat_ref)
        s_ref[:] = jnp.zeros_like(s_ref)
        ll_ref[0, 0] = 0.0

    theta = theta_ref[:]
    gene_iota = jax.lax.broadcasted_iota(jnp.int32, (Bt, G), 1)

    def onehot(pos: int):
        return (gene_iota == trip_ref[:, pos][:, None]).astype(jnp.float32)

    # Gather theta rows as one-hot matmuls (MXU; no per-row DMA).
    oh1, oh2, oh3 = onehot(0), onehot(1), onehot(2)
    th1 = jnp.dot(oh1, theta, preferred_element_type=jnp.float32)
    th2 = jnp.dot(oh2, theta, preferred_element_type=jnp.float32)
    th3 = jnp.dot(oh3, theta, preferred_element_type=jnp.float32)

    # Rating one-hot [Bt, R] (R tiny; static per-rating slices below).
    r_onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (Bt, R), 1) == r_ref[:, 0][:, None]
    ).astype(jnp.float32)

    # T_all[b, (r,k,l)] = sum_m th3[b,m] p[k,l,m,r]; select r_b statically.
    T_all = jnp.dot(th3, p_m_ref[:], preferred_element_type=jnp.float32)
    T = jnp.zeros((Bt, K2), jnp.float32)
    for rr in range(R):
        T += T_all[:, rr * K2 : (rr + 1) * K2] * r_onehot[:, rr : rr + 1]

    e1, e2 = e1_ref[:], e2_ref[:]
    th1_spread = jnp.dot(th1, e1, preferred_element_type=jnp.float32)
    th2_spread = jnp.dot(th2, e2, preferred_element_type=jnp.float32)

    # Marginal helpers and denominator.
    A1 = jnp.dot(T * th2_spread, e1.T, preferred_element_type=jnp.float32)
    A2 = jnp.dot(T * th1_spread, e2.T, preferred_element_type=jnp.float32)
    D = jnp.sum(th1 * A1, axis=1, keepdims=True)                   # [Bt, 1]

    W = th1_spread * th2_spread                                    # [Bt, K^2]
    A3_all = jnp.dot(W, p_kk_ref[:], preferred_element_type=jnp.float32)
    A3 = jnp.zeros((Bt, K), jnp.float32)
    for rr in range(R):
        A3 += A3_all[:, rr * K : (rr + 1) * K] * r_onehot[:, rr : rr + 1]

    w = w_ref[:]                                                   # [Bt, 1]
    scale = w / (D + _EPS)                                         # [Bt, 1]

    # theta accumulators: scatter-add as transposed one-hot matmuls.
    s1 = th1 * A1 * scale
    s2 = th2 * A2 * scale
    s3 = th3 * A3 * scale
    theta_hat_ref[:] += (
        jnp.dot(oh1.T, s1, preferred_element_type=jnp.float32)
        + jnp.dot(oh2.T, s2, preferred_element_type=jnp.float32)
        + jnp.dot(oh3.T, s3, preferred_element_type=jnp.float32)
    )

    # p accumulator: S[(k,l), (r,m)] += (W*scale)^T @ concat_r(onehot_r * th3)
    V = W * scale
    th3r = jnp.concatenate(
        [th3 * r_onehot[:, rr : rr + 1] for rr in range(R)], axis=1
    )                                                              # [Bt, R*K]
    s_ref[:] += jnp.dot(V.T, th3r, preferred_element_type=jnp.float32)

    ll_ref[0, 0] += jnp.sum(w * jnp.log(D + _EPS))


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def _pallas_stats(
    theta: jax.Array,
    p: jax.Array,
    triplets: jax.Array,
    ratings: jax.Array,
    weights: jax.Array,
    tile_b: int = DEFAULT_TILE_B,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    G, K = theta.shape
    R = p.shape[-1]
    B = triplets.shape[0]
    assert B % tile_b == 0, f"batch {B} must be padded to a multiple of {tile_b}"
    n_tiles = B // tile_b

    # p views with the rating class as the MAJOR column block (static slices
    # in-kernel; Mosaic cannot split minor dims).
    p_m = jnp.transpose(p, (2, 3, 0, 1)).reshape(K, R * K * K)
    p_kk = jnp.transpose(p, (0, 1, 3, 2)).reshape(K * K, R * K)
    e1_np, e2_np = _selectors(K)
    e1, e2 = jnp.asarray(e1_np), jnp.asarray(e2_np)

    kernel = functools.partial(_em_tile_kernel, k=K, n_ratings=R)
    theta_hat, s, ll = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_b, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, R * K * K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K * K, R * K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, K * K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, K * K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K * K, R * K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, K), jnp.float32),
            jax.ShapeDtypeStruct((K * K, R * K), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (6 * G * K + 3 * K * K * K * R),
            bytes_accessed=B * (3 * 4 + 4 + 4) + G * K * 4 * 2,
            transcendentals=B,
        ),
        interpret=interpret,
    )(
        triplets,
        ratings[:, None],
        weights[:, None].astype(jnp.float32),
        theta.astype(jnp.float32),
        p_m.astype(jnp.float32),
        p_kk.astype(jnp.float32),
        e1,
        e2,
    )
    return theta_hat, s, ll


def pallas_em_sufficient_stats(
    theta: jax.Array,
    p: jax.Array,
    batch: Batch,
    precision=None,  # signature-compatible with em_sufficient_stats; unused
    tile_b: int = DEFAULT_TILE_B,
    interpret: bool | None = None,
) -> SweepStats:
    """Drop-in replacement for ops.em.em_sufficient_stats (Pallas path).

    ``interpret`` defaults to True off-TPU so CPU tests exercise the same
    kernel logic.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    theta_hat, s, ll = _pallas_stats(
        theta,
        p,
        batch.triplets,
        batch.ratings,
        batch.weights,
        tile_b=tile_b,
        interpret=interpret,
    )
    K = theta.shape[-1]
    R = p.shape[-1]
    # s columns are (r, m); back to [K, K, K, R].
    p_hat = p * jnp.transpose(s.reshape(K, K, R, K), (0, 1, 3, 2))
    return SweepStats(theta_hat=theta_hat, p_hat=p_hat, loglik=ll[0, 0])
