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

# Per-tile VMEM budget for the kernel's [Bt, G] one-hot scratch (bytes).
_ONEHOT_BUDGET = 8 * 1024 * 1024


def kernel_fits(n_genes: int, k: int, tile_b: int = 512) -> bool:
    onehot_bytes = tile_b * n_genes * 4
    accum_bytes = n_genes * k * 4 * 2
    return onehot_bytes + accum_bytes < _ONEHOT_BUDGET


def resolve_stats_fn(
    backend: str,
    n_genes: int,
    k: int,
    tile_b: int = 512,
) -> Optional[Callable]:
    """Return a stats_fn override for the sharded EM step, or None for jnp.

    Raises on backend='pallas' when the shapes cannot fit the kernel.
    """
    if backend in (None, "", "jnp"):
        return None
    fits = kernel_fits(n_genes, k, tile_b)
    if backend == "pallas":
        if not fits:
            raise ValueError(
                f"pallas kernel does not fit VMEM at G={n_genes}, "
                f"tile_b={tile_b}; use backend='jnp' or a smaller tile"
            )
        return _pallas_fn(tile_b)
    if backend == "auto":
        if jax.default_backend() == "tpu" and fits:
            return _pallas_fn(tile_b)
        return None
    raise ValueError(f"unknown backend {backend!r}")


def _pallas_fn(tile_b: int) -> Callable:
    from trigenicinteractionpredictor_tpu.ops.pallas_em import (
        pallas_em_ensemble_stats,
    )

    fn = functools.partial(pallas_em_ensemble_stats, tile_b=tile_b)
    fn.ensemble = True  # one call with stacked restarts (sharded_em.py)
    return fn
