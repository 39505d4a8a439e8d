"""Compute-backend selection for the EM sweep (EngineConfig.backend).

'auto' picks the Pallas fused kernel on TPU when the shapes fit its VMEM
budget, else the jnp/XLA path.  Both are numerically interchangeable
(tests/test_kernel_parity.py); the kernel is ~12x faster on the axon chip
at Kuzmin scale (measured 2.05 ms vs 24 ms per sweep at N=131k, K=10).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax

from trigenicinteractionpredictor_tpu.ops.em import em_sufficient_stats

# Per-tile VMEM budget heuristic.  Mosaic reuses dead buffers, so the naive
# sum of live tensors overestimates badly — K=50/G=1000/tile=256 sums to
# ~15 MB yet compiles and runs (validated on-chip at 20.4M triplets/s).
# The model below counts the two genuinely co-live groups (one-hots +
# persistent accumulators) plus one K^2-wide tile, against a loose budget.
_VMEM_BUDGET = 14 * 1024 * 1024


def kernel_fits(n_genes: int, k: int, tile_b: int = 512, n_samples: int = 1) -> bool:
    s = max(n_samples, 1)
    onehot = 3 * tile_b * n_genes * 4                 # oh1..oh3 [Bt, G]
    k2_tile = tile_b * k * k * 2 * 4                  # widest [Bt, R*K^2] tile
    theta = n_genes * s * k * 4 * 2                   # theta + theta_hat accum
    p_views = 2 * s * k * k * k * 2 * 4               # p_m + p_kk (R~2)
    return onehot + k2_tile + theta + p_views < _VMEM_BUDGET


def _fit_tile(n_genes: int, k: int, tile_b: int) -> Optional[int]:
    """Largest tile <= tile_b that fits VMEM (halving, floor 128)."""
    t = tile_b
    while t >= 128:
        if kernel_fits(n_genes, k, t):
            return t
        t //= 2
    return None


def resolve_stats_fn(
    backend: str,
    n_genes: int,
    k: int,
    tile_b: int = 512,
    arity: int = 3,
) -> Optional[Callable]:
    """Return a stats_fn override for the sharded EM step, or None for jnp.

    The tile size shrinks automatically for large K/G working sets.
    Raises on backend='pallas' when no tile fits.  The digenic (arity-2)
    family always uses the jnp path: its sweep is K^2-scale and nowhere
    near the MXU roofline, so a hand kernel would buy nothing.
    """
    if backend in (None, "", "jnp") or arity != 3:
        return None
    tile = _fit_tile(n_genes, k, tile_b)
    if backend == "pallas":
        if tile is None:
            raise ValueError(
                f"pallas kernel does not fit VMEM at G={n_genes}, K={k}; "
                "use backend='jnp'"
            )
        return _pallas_fn(tile)
    if backend == "auto":
        if jax.default_backend() == "tpu" and tile is not None:
            return _pallas_fn(tile)
        return None
    raise ValueError(f"unknown backend {backend!r}")


def _pallas_fn(tile_b: int) -> Callable:
    from trigenicinteractionpredictor_tpu.ops.pallas_em import (
        pallas_em_ensemble_stats,
    )

    fn = functools.partial(pallas_em_ensemble_stats, tile_b=tile_b)
    fn.ensemble = True  # one call with stacked restarts (sharded_em.py)
    return fn
