"""Fused ensemble scoring kernel — the serving hot path (SURVEY.md §4.4).

The jnp ensemble scorer runs at ~5.3M rows/s at the production S=10
(round-5 measurement: materialized [S, B, K^2] outer products + small
per-restart matmuls + the anti-miscompile barriers keep it at ~1% MXU),
while the EM kernel sustains 42.6M rows/s doing strictly MORE work per
row.  Serving deserves the same treatment: this kernel computes the full
rating distribution D_b(r, s) = sum_klm th1 th2 th3 p_s[k,l,m,r] for
every row and every restart in one fused pass —

    th1..3_all = onehot([Bt, G]) @ theta_all          (shared gathers)
    W          = (th1_all @ E1_bd) * (th2_all @ E2_bd)   [Bt, S*K^2]
    A3_all     = W @ P_kk_bd                             [Bt, R*S*K]
    D[:, r, :] = (A3_all[r-block] * th3_all) @ KS        [Bt, S]

— the bd kernel's algebra (ops/pallas_em_bd.py) truncated after A3: no
M-step statistics, no scale chain.  Because theta rows are on the
simplex, sum_r D_b(r) == 1 exactly, so D IS the predictive distribution
(same semantics as ops/scoring.predict_proba, which also does not
re-normalize).

Like the one-hot EM family the kernel holds [Bt, G] one-hots in VMEM, so
it serves the reference-scale G; larger G falls back to the batched jnp
scorer (ops/scoring.py picks automatically).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trigenicinteractionpredictor_tpu.ops.pallas_em_bd import (
    _bd_params,
    _bd_selectors,
)

DEFAULT_TILE_B = 512
# The scoring body is much simpler than the EM kernels (no accumulators,
# no scale chain, 3 live slabs), so its envelope runs closer to Mosaic's
# real ~16 MB scoped limit than the EM families' conservative 14.5 MB.
# Measured-good anchor: t512 at G=1000/K=10/S=10 (the production serving
# shape) compiles and runs 56.2M rows/s on-chip (2026-08-21).
_VMEM_BUDGET = int(15.5 * 1024 * 1024)


def score_kernel_fits(
    n_genes: int, k: int, n_samples: int, tile_b: int = DEFAULT_TILE_B,
    n_ratings: int = 2,
) -> bool:
    """Analytic VMEM envelope: the one-hot trio + ~3 live [Bt, S*K^2]
    slabs + the block-diagonal operands."""
    s = max(n_samples, 1)
    sk, sk2 = s * k, s * k * k
    r = max(n_ratings, 2)
    onehot = 3 * tile_b * n_genes * 4
    slabs = 3 * tile_b * sk2 * 4 + tile_b * r * sk * 4
    operands = (2 * sk * sk2 + sk2 * r * sk + n_genes * sk) * 4
    return onehot + slabs + operands < _VMEM_BUDGET


def _fit_score_tile(
    n_genes: int, k: int, n_samples: int, tile_b: int = DEFAULT_TILE_B
) -> Optional[int]:
    t = tile_b
    while t >= 128:
        if score_kernel_fits(n_genes, k, n_samples, t):
            return t
        t //= 2
    return None


def _score_tile_kernel(
    trip_ref,      # int32 [Bt, 3]
    theta_ref,     # f32 [G, S*K]
    pkk_ref,       # f32 [S*K2, R*S*K] block-diag
    e1_ref,        # f32 [S*K, S*K2] block-diag
    e2_ref,        # f32 [S*K, S*K2]
    ks_ref,        # f32 [S*K, S]
    out_ref,       # f32 [Bt, R*S]
    *,
    k: int,
    n_ratings: int,
    n_samples: int,
):
    prec = None  # DEFAULT: single-pass MXU; ~1e-3 score noise, fine for ranking
    K, R, S = k, n_ratings, n_samples
    Bt = trip_ref.shape[0]
    G = theta_ref.shape[0]
    SK = S * K

    theta = theta_ref[:]
    gene_iota = jax.lax.broadcasted_iota(jnp.int32, (Bt, G), 1)

    def onehot(pos):
        return (gene_iota == trip_ref[:, pos][:, None]).astype(jnp.float32)

    th1_all = jnp.dot(onehot(0), theta, preferred_element_type=jnp.float32, precision=prec)
    th2_all = jnp.dot(onehot(1), theta, preferred_element_type=jnp.float32, precision=prec)
    th3_all = jnp.dot(onehot(2), theta, preferred_element_type=jnp.float32, precision=prec)

    spread1 = jnp.dot(th1_all, e1_ref[:], preferred_element_type=jnp.float32, precision=prec)
    spread2 = jnp.dot(th2_all, e2_ref[:], preferred_element_type=jnp.float32, precision=prec)
    W = spread1 * spread2                                  # [Bt, S*K2]
    A3_all = jnp.dot(W, pkk_ref[:], preferred_element_type=jnp.float32, precision=prec)

    for rr in range(R):
        Dr = jnp.dot(
            A3_all[:, rr * SK : (rr + 1) * SK] * th3_all, ks_ref[:],
            preferred_element_type=jnp.float32, precision=prec,
        )                                                  # [Bt, S]
        out_ref[:, rr * S : (rr + 1) * S] = Dr


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def _pallas_score(
    thetas: jax.Array,    # [S, G, K]
    ps: jax.Array,        # [S, K, K, K, R]
    triplets: jax.Array,  # int32 [B, 3], B % tile_b == 0
    tile_b: int,
    interpret: bool = False,
) -> jax.Array:
    """D[b, r, s] for every padded row: f32 [B, R, S]."""
    S, G, K = thetas.shape
    R = ps.shape[-1]
    B = triplets.shape[0]
    assert B % tile_b == 0, (B, tile_b)
    n_tiles = B // tile_b
    SK = S * K

    theta_all = jnp.transpose(thetas, (1, 0, 2)).reshape(G, SK)
    _, P_kk_bd = _bd_params(ps.astype(jnp.float32))
    E1, E2, KS, _ = _bd_selectors(K, S)

    kernel = functools.partial(
        _score_tile_kernel, k=K, n_ratings=R, n_samples=S
    )
    tile_spec = lambda w_: pl.BlockSpec(  # noqa: E731
        (tile_b, w_), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    full_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            tile_spec(3),
            full_spec((G, SK)),
            full_spec((S * K * K, R * SK)),
            full_spec((SK, S * K * K)),
            full_spec((SK, S * K * K)),
            full_spec((SK, S)),
        ],
        out_specs=tile_spec(R * S),
        out_shape=jax.ShapeDtypeStruct((B, R * S), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (3 * G * SK + 2 * SK * S * K * K
                           + S * K * K * R * SK // max(S, 1)),
            bytes_accessed=B * (3 * 4 + R * S * 4) + G * SK * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        triplets,
        theta_all.astype(jnp.float32),
        P_kk_bd,
        jnp.asarray(E1),
        jnp.asarray(E2),
        jnp.asarray(KS),
    )
    return out.reshape(B, R, S)


def pallas_ensemble_predict_interaction(
    states,
    triplets: jax.Array,
    interact_rating: int = 1,
    tile_b: int = 0,
    interpret: bool | None = None,
) -> jax.Array:
    """Sample-averaged P(interact) through the fused scoring kernel.

    Pads rows to the tile internally (padding scores are dropped), so any
    B works.  Caller is responsible for checking score_kernel_fits.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    thetas, ps = states.theta, states.p
    S, G, K = thetas.shape
    tile = tile_b or (_fit_score_tile(G, K, S) or DEFAULT_TILE_B)
    B = triplets.shape[0]
    Bp = -(-B // tile) * tile
    trips_p = jnp.zeros((Bp, 3), jnp.int32).at[:B].set(triplets)
    d = _pallas_score(thetas, ps, trips_p, tile_b=tile, interpret=interpret)
    return jnp.mean(d[:B, interact_rating, :], axis=-1)
