"""Compute-backend selection for the EM sweep (EngineConfig.backend).

'auto' picks the Pallas fused kernel on TPU when the shapes fit its VMEM
budget, else the jnp/XLA path.  Both are numerically interchangeable
(tests/test_kernel_parity.py); the kernel is ~12x faster on the axon chip
at Kuzmin scale (measured 2.05 ms vs 24 ms per sweep at N=131k, K=10).

Every returned kernel fn carries a ``tile_b`` attribute — the trainer pads
the batch to ``data_shards * tile_b`` only for genuine Pallas kernels, never
for the jnp row-chunk fallback (which needs no tile alignment).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from trigenicinteractionpredictor_tpu.ops.em import em_sufficient_stats

# Per-tile VMEM budget heuristic, calibrated against Mosaic's reported
# scoped-stack sizes on the axon chip:
# - K=10/G=1000/tile=512/S=8 and S=10 compile and run through the
#   production scan/shard_map step (BASELINE.md: 158M/s and 166M/s);
# - the same S=10 kernel OOMs at 16.36 MB of Mosaic stack when compiled
#   through a bare jit with forced operand layouts — if you call
#   pallas_em_ensemble_stats outside the trainer/bench path and hit a VMEM
#   error, drop tile_b to 256;
# - K=50/G=1000/tile=256/S=1 compiles and runs (20.4M triplets/s);
# - K=10/G=1300/tile=512 estimates 15.9 MB of one-hots alone — rejected.
# The model counts the one-hot trio twice (the gather operands and the
# transposed scatter operands co-exist around the output matmuls) plus the
# S-wide lane streams.
_VMEM_BUDGET = int(14.5 * 1024 * 1024)


def kernel_fits(n_genes: int, k: int, tile_b: int = 512, n_samples: int = 1) -> bool:
    s = max(n_samples, 1)
    onehot = 2 * 3 * tile_b * n_genes * 4             # oh1..oh3 [Bt, G], x2
    k2_tile = tile_b * k * k * 2 * 4                  # widest [Bt, R*K^2] tile
    lanes = 3 * tile_b * s * k * 4 * 2                # th_all + s_all streams
    theta = n_genes * s * k * 4 * 2                   # theta + theta_hat accum
    p_views = 2 * s * k * k * k * 2 * 4               # p_m + p_kk (R~2)
    return onehot + k2_tile + lanes + theta + p_views < _VMEM_BUDGET


def _fit_tile(
    n_genes: int, k: int, tile_b: int, n_samples: int = 1
) -> Optional[int]:
    """Largest tile <= tile_b that fits VMEM (halving, floor 128)."""
    t = tile_b
    while t >= 128:
        if kernel_fits(n_genes, k, t, n_samples):
            return t
        t //= 2
    return None


def _pick_bdr_group(s: int, k: int) -> int:
    """Restart sub-group width for the bdr kernel's block-diagonal stages.

    Measured rule (tools/bdr_group_sweep.py, on-chip 2026-08-20): per-stage
    matmul width g*K wants to sit at-or-under the 128-lane MXU — S=20/K=10
    runs 438M upd/s at g=10 (100 lanes) vs 316M at g=20 (200 lanes), while
    g=10 vs g=5 at S=10 is a tie (427M vs 430M) and g<=2 loses to
    invocation latency (394M/383M).  So: the largest divisor of S with
    g*K <= 128; if only tiny groups divide S (prime-ish S), one wide group
    up to 256 lanes still beats a per-restart loop.
    """
    s = max(s, 1)
    divs = [g for g in range(1, s + 1) if s % g == 0]
    good = [g for g in divs if g * k <= 128]
    best = max(good) if good else 1
    if best * k < 64:
        wide = [g for g in divs if g * k <= 256]
        if wide:
            best = max(wide)
    return best


def bdr_kernel_fits(
    n_genes: int, k: int, tile_b: int = 512, n_samples: int = 1,
    group: int = 0,
) -> bool:
    """VMEM envelope for the bdr kernel (ops/pallas_em_bdr.py).

    Second calibration (on-chip 2026-08-20, after the per-group operand
    restack): operands arrive as nb stacked [gK, gK2] diagonal blocks and
    ONE shared selector block, so operand VMEM no longer scales with S^2
    and wide ensembles (S=50, S=100) run as a single call.
    Measured-good: t512/S10/g10 (426M upd/s), t256/S50/g10 (508M),
    t128/S100/g10 (489M), t256/S20/g10 (438M), t256/S20/g20,
    t256/K16/g5 (174M), t256/K20/g5 (137M).
    Measured-bad: t512/S50/g10 (scoped VMEM +12.75M over the 16M limit),
    t256/S100/g10 (+8.39M), and t256/K20/g2 (+2.29M — NOTE: smaller
    groups are not monotonically cheaper; many-group concat pressure can
    exceed a wider group's slabs, so a forced bdr_group below the picked
    one may OOM inside this envelope).  This is an envelope of measured
    shapes, not a residency model — Mosaic streams more than a naive sum
    admits.
    K cap: K=25/50 shapes compile-probed OK at N=32k but threw remote-
    compile 500s at production N=131k (and wedged the relay connection,
    twice); K-grid configs keep the proven per-restart kernel path.
    """
    s = max(n_samples, 1)
    g = group or _pick_bdr_group(s, k)
    k2 = k * k
    gk2 = g * k2
    if k > 20:
        return False
    # 1. tile-scaled one-hot trio + the G-sized theta/theta_hat pair:
    #    G=2000/t512 measured OK, G=3000/t512 OOM (round-3 first probe).
    tiled = 3 * tile_b * n_genes * 4 + 2 * n_genes * s * k * 4
    # 2. ensemble working set: retained per-group W slabs (t*S*K2 total
    #    across groups), ~8 [t, SK]-wide streams (th/A/scale/s), 3 live
    #    [t, gK2] slabs.  12.3M passes (t256/S50), 21.5M fails (t256/S100).
    ens = (tile_b * s * k2 + 8 * tile_b * s * k + 3 * tile_b * gk2) * 4
    # 3. operand stacks (Pm+Pkk rating blocks) + the cross output block:
    #    12M measured OK at S=100/g=10; no measured failure yet, so the
    #    cap is conservative headroom, not a pinned boundary.
    mats = (2 * s * k * gk2 + s * k2 * g * k) * 4
    return tiled <= int(20e6) and ens <= int(13e6) and mats <= int(16e6)


def _fit_bdr_tile(
    n_genes: int, k: int, tile_b: int, n_samples: int = 1, group: int = 0
) -> Optional[Tuple[int, int]]:
    """Largest (tile, group) the bdr envelope admits, or None."""
    g = group or _pick_bdr_group(max(n_samples, 1), k)
    t = tile_b
    while t >= 128:
        if bdr_kernel_fits(n_genes, k, t, n_samples, group=g):
            return t, g
        t //= 2
    return None


def _pallas_bdr_fn(tile_b: int, group: int = 0) -> Callable:
    from trigenicinteractionpredictor_tpu.ops.pallas_em_bdr import (
        bdr_em_ensemble_stats,
    )

    fn = functools.partial(bdr_em_ensemble_stats, tile_b=tile_b, group=group)
    fn.ensemble = True
    fn.tile_b = tile_b
    fn.bdr_group = group
    fn.needs_rsort = True  # trainer sorts rows by rating + attaches tile_rating
    return fn


def hybrid_kernel_fits(
    n_genes: int, k: int, tile_b: int = 512, n_samples: int = 1
) -> bool:
    """VMEM model for the hybrid kernel (ops/pallas_em_hybrid.py).

    Only the SCATTER one-hot trio is G-sized (the gather runs as an XLA
    row-take outside the kernel), so the one-hot term is half the one-hot
    kernel's and the G ceiling roughly doubles; the pre-gathered th tiles
    add three more [Bt, S*K] input streams.
    """
    s = max(n_samples, 1)
    onehot = 3 * tile_b * n_genes * 4                 # scatter one-hots only
    k2_tile = tile_b * k * k * 2 * 4                  # widest [Bt, R*K^2] tile
    lanes = 3 * tile_b * s * k * 4 * 3                # th inputs (buffered) + s streams
    theta_hat = n_genes * s * k * 4                   # VMEM accumulator
    p_views = 2 * s * k * k * k * 2 * 4               # p_m + p_kk (R~2)
    return onehot + k2_tile + lanes + theta_hat + p_views < _VMEM_BUDGET


def _fit_hybrid_tile(
    n_genes: int, k: int, tile_b: int, n_samples: int = 1
) -> Optional[int]:
    t = tile_b
    while t >= 128:
        if hybrid_kernel_fits(n_genes, k, t, n_samples):
            return t
        t //= 2
    return None


def _pallas_hybrid_fn(tile_b: int) -> Callable:
    from trigenicinteractionpredictor_tpu.ops.pallas_em_hybrid import (
        hybrid_em_ensemble_stats,
    )

    fn = functools.partial(hybrid_em_ensemble_stats, tile_b=tile_b)
    fn.ensemble = True
    fn.tile_b = tile_b
    return fn


# Large-G path (ops/pallas_em_large.py): no G-sized kernel buffers, so the
# VMEM model only depends on (tile, K, S, wb).
_LARGE_G_WB = 512


def large_kernel_fits(
    k: int, tile_b: int, n_samples: int = 1, wb: int = _LARGE_G_WB
) -> bool:
    s = max(n_samples, 1)
    sk = s * k
    r = 3  # worst-case rating classes for the budget
    e_kernel = (
        6 * tile_b * sk * 4 * 2        # th tiles in + s tiles out, buffered
        + tile_b * r * k * k * 4 * 2   # T_all / A3_all widest tiles
        + 2 * s * k * k * k * r * 4    # p views
        + s * k * k * r * k * 4        # sacc accumulator
    )
    scatter = (
        tile_b * wb * 4                # local one-hot
        + wb * sk * 4 * 2              # output block + contrib
        + tile_b * sk * 4 * 2          # value tile, buffered
    )
    return max(e_kernel, scatter) < _VMEM_BUDGET


def _fit_large_tile(
    k: int, tile_b: int, n_samples: int = 1
) -> Optional[int]:
    t = tile_b
    while t >= 128:
        if large_kernel_fits(k, t, n_samples):
            return t
        t //= 2
    return None


def resolve_stats_fn(
    backend: str,
    n_genes: int,
    k: int,
    tile_b: int = 512,
    arity: int = 3,
    n_samples: int = 1,
    static_rows: bool = True,
    bdr_group: int = 0,
    minibatch_rsort: bool = False,
) -> Optional[Callable]:
    """Return a stats_fn override for the sharded EM step, or None for jnp.

    The tile size shrinks automatically for large K/G/ensemble working sets.
    Raises on backend='pallas' when no tile fits.  The digenic (arity-2)
    family always uses the jnp path: its sweep is K^2-scale and nowhere
    near the MXU roofline, so a hand kernel would buy nothing.

    ``static_rows=False`` (stepwise EM reshuffles rows every epoch)
    excludes the kernels that precompute a host-side row order — the
    rating-sorted bdr kernel and the large-G scatter-plan path — leaving
    the order-free one-hot/hybrid family.

    ``bdr_group`` (default 0 = full-S) overrides the bdr kernel's restart
    sub-group width (tools/bdr_group_sweep.py measures the frontier;
    must divide n_samples).

    ``minibatch_rsort`` says the caller re-sorts every minibatch by
    rating itself (the stepwise trainer does, per epoch) — the bdr
    kernel then stays eligible even with ``static_rows=False``; the
    large-G scatter-plan path stays excluded either way (its plan is
    tied to one whole-dataset row array).
    """
    if backend in (None, "", "jnp") or arity != 3:
        if backend not in (None, "", "jnp", "auto", "pallas"):
            raise ValueError(f"unknown backend {backend!r}")
        return None
    if backend not in ("auto", "pallas"):
        raise ValueError(f"unknown backend {backend!r}")
    # Fastest first: the bdr kernel (block-diag ensemble algebra over
    # rating-sorted tiles) measured 1.84x the one-hot kernel at the
    # headline shape (5.70 vs 10.48 ms single-dispatch at G=1000/K=10/
    # S=10 — BASELINE.md round-3 race).  Needs a static row order.  Its
    # Mosaic program size is S-INDEPENDENT (no unrolled restart loop), so
    # unlike the one-hot family it takes any ensemble width its VMEM
    # envelope admits — no lane-group cap.
    if static_rows or minibatch_rsort:
        fit = _fit_bdr_tile(n_genes, k, tile_b, n_samples, group=bdr_group)
        if fit is not None and (
            backend == "pallas" or jax.default_backend() == "tpu"
        ):
            tile_bdr, group_bdr = fit
            return _pallas_bdr_fn(tile_bdr, group=group_bdr)
    # The ensemble kernel unrolls the per-restart algebra in its tile body;
    # very wide ensembles both exceed VMEM and blow up the Mosaic program
    # (S=50 crashes the compile helper).  Cap the lane-stacked group and
    # run groups under lax.map (remainder group handled separately, so any
    # S works — including primes).
    if n_samples > _MAX_ENSEMBLE_GROUP:
        group = _pick_group(n_genes, k, tile_b, n_samples)
        # 'auto' only groups on real TPUs (interpret-mode groups on CPU are
        # slower than jnp); an explicit 'pallas' request is honored anywhere.
        if group is not None and (
            backend == "pallas" or jax.default_backend() == "tpu"
        ):
            return _pallas_grouped_fn(
                _fit_tile(n_genes, k, tile_b, group), group
            )
        tile = None  # fall through to single-restart kernel or jnp
    else:
        tile = _fit_tile(n_genes, k, tile_b, n_samples)
    # Large-K fallback: the S-wide ensemble kernel may not fit VMEM while
    # the single-restart kernel does.  The sharded step runs restarts as a
    # sequential lax.map past K >= 32 (parallel/sharded_em.py), so handing
    # it the per-restart kernel keeps the MXU path (measured 20.4M
    # triplets/s at K=50 vs 1.4M on the chunked jnp path).
    tile1 = _fit_tile(n_genes, k, tile_b, 1) if tile is None and k >= 32 else None
    # Mid-G fallback: the hybrid kernel (ops/pallas_em_hybrid.py) drops the
    # G-sized GATHER one-hots (XLA row-take instead), roughly doubling the
    # G ceiling, and measured faster than the plan path where both run
    # (104M vs 94M updates/s at G=4000/K=10/S=10 — BASELINE.md roofline).
    tile_h = None
    if tile is None and tile1 is None and n_samples <= _MAX_ENSEMBLE_GROUP:
        tile_h = _fit_hybrid_tile(n_genes, k, tile_b, n_samples)
    # Large-G fallback: the one-hot kernels are G-capped by their [Bt, G]
    # VMEM one-hots; the pre-gathered + sorted-block-scatter path
    # (ops/pallas_em_large.py) has no G-sized buffer, at the cost of a
    # host-built scatter plan (Batch.scatter_*; the trainer attaches one
    # when this fn's .needs_plan is set).  Only worth it once the one-hot
    # AND hybrid kernels are out of the game; capped at the same Mosaic
    # program-size ensemble width.
    tile_lg = None
    if (
        tile is None
        and tile1 is None
        and tile_h is None
        and static_rows  # the scatter plan bakes a row order too
        and n_samples <= _MAX_ENSEMBLE_GROUP
    ):
        tile_lg = _fit_large_tile(k, tile_b, n_samples)
    if backend == "pallas":
        if tile is not None:
            return _pallas_fn(tile)
        if tile1 is not None:
            return _pallas_single_fn(tile1)
        if tile_h is not None:
            return _pallas_hybrid_fn(tile_h)
        if tile_lg is not None:
            return _pallas_large_fn(tile_lg, n_genes)
        raise ValueError(
            f"pallas kernel does not fit VMEM at G={n_genes}, K={k}, "
            f"S={n_samples} (no tile >= 128 fits"
            + (
                f"; no ensemble group <= {_MAX_ENSEMBLE_GROUP} fits either"
                if n_samples > _MAX_ENSEMBLE_GROUP
                else ""
            )
            + "); use backend='jnp'"
        )
    # backend == "auto"
    if jax.default_backend() == "tpu":
        if tile is not None:
            return _pallas_fn(tile)
        if tile1 is not None:
            return _pallas_single_fn(tile1)
        if tile_h is not None:
            return _pallas_hybrid_fn(tile_h)
        if tile_lg is not None:
            return _pallas_large_fn(tile_lg, n_genes)
    return None


def _pallas_fn(tile_b: int) -> Callable:
    from trigenicinteractionpredictor_tpu.ops.pallas_em import (
        pallas_em_ensemble_stats,
    )

    fn = functools.partial(pallas_em_ensemble_stats, tile_b=tile_b)
    fn.ensemble = True  # one call with stacked restarts (sharded_em.py)
    fn.tile_b = tile_b
    return fn


# Max restarts lane-stacked into ONE kernel call: the per-restart algebra
# unrolls in the tile body, so very wide ensembles blow up the Mosaic
# program (S=50 crashed the compile helper) besides exceeding VMEM.
_MAX_ENSEMBLE_GROUP = 10


def _pick_group(
    n_genes: int, k: int, tile_b: int, n_samples: int
) -> Optional[int]:
    """Group size for lane-stacking a wide ensemble: the largest
    g <= _MAX_ENSEMBLE_GROUP whose ensemble kernel fits VMEM, preferring
    exact divisors of n_samples (one compiled kernel instead of two).
    None if nothing >= 2 fits."""
    best = None
    for g in range(min(_MAX_ENSEMBLE_GROUP, n_samples), 1, -1):
        if _fit_tile(n_genes, k, tile_b, g) is None:
            continue
        if n_samples % g == 0:
            return g
        if best is None:
            best = g
    return best


def _pallas_grouped_fn(tile_b: int, group: int) -> Callable:
    """Ensemble kernel over restart groups: full groups of ``group`` lanes
    run under lax.map; a non-divisor tail runs as one extra (narrower)
    kernel call, so any S works."""
    from trigenicinteractionpredictor_tpu.ops.pallas_em import (
        pallas_em_ensemble_stats,
    )

    def fn(thetas, ps, batch, precision=None):
        S = thetas.shape[0]
        n_full = S // group
        rem = S % group
        outs = []
        if n_full:
            th_g = thetas[: n_full * group].reshape(
                n_full, group, *thetas.shape[1:]
            )
            p_g = ps[: n_full * group].reshape(n_full, group, *ps.shape[1:])
            stats = jax.lax.map(
                lambda tp: pallas_em_ensemble_stats(
                    tp[0], tp[1], batch, tile_b=tile_b
                ),
                (th_g, p_g),
            )
            outs.append(
                jax.tree.map(
                    lambda x: x.reshape(n_full * group, *x.shape[2:]), stats
                )
            )
        if rem:
            outs.append(
                pallas_em_ensemble_stats(
                    thetas[n_full * group :],
                    ps[n_full * group :],
                    batch,
                    tile_b=tile_b,
                )
            )
        if len(outs) == 1:
            return outs[0]
        return jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), *outs
        )

    fn.ensemble = True  # takes stacked restarts in one call
    fn.tile_b = tile_b
    return fn


def _pallas_bd_plan_fn(tile_b: int, n_genes: int) -> Callable:
    """Large-G variant with the block-diagonal E-step: bd algebra between
    the XLA gather and the sorted-block plan scatter (ops/pallas_em_bd.py).
    Same Batch contract as the plan path (needs_plan).

    NOT dispatched: at G=100k the compiled kernel FAULTS the relay-side
    TPU worker process at runtime (observed twice, 2026-08-20 — every
    subsequent call in the client session fails UNAVAILABLE), while the
    per-restart plan path runs clean.  Kept for future investigation;
    resolve_stats_fn keeps returning _pallas_large_fn for large G."""
    from trigenicinteractionpredictor_tpu.ops.pallas_em_bd import (
        bd_em_ensemble_stats,
    )

    n_blocks = -(-n_genes // _LARGE_G_WB)
    fn = functools.partial(
        bd_em_ensemble_stats,
        tile_b=tile_b,
        wb=_LARGE_G_WB,
        n_blocks=n_blocks,
    )
    fn.ensemble = True
    fn.tile_b = tile_b
    fn.wb = _LARGE_G_WB
    fn.needs_plan = True
    return fn


def _pallas_large_fn(tile_b: int, n_genes: int) -> Callable:
    """Large-G ensemble path; requires a scatter plan on the Batch."""
    from trigenicinteractionpredictor_tpu.ops.pallas_em_large import (
        large_g_ensemble_stats,
    )

    n_blocks = -(-n_genes // _LARGE_G_WB)
    fn = functools.partial(
        large_g_ensemble_stats,
        tile_b=tile_b,
        wb=_LARGE_G_WB,
        n_blocks=n_blocks,
    )
    fn.ensemble = True
    fn.tile_b = tile_b
    fn.wb = _LARGE_G_WB
    fn.needs_plan = True
    return fn


def _pallas_single_fn(tile_b: int) -> Callable:
    """Per-restart kernel (no .ensemble attr -> mapped by the caller)."""
    from trigenicinteractionpredictor_tpu.ops.pallas_em import (
        pallas_em_sufficient_stats,
    )

    fn = functools.partial(pallas_em_sufficient_stats, tile_b=tile_b)
    fn.tile_b = tile_b
    return fn
