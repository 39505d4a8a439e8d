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

from trigenicinteractionpredictor_tpu.ops import calibration
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
    group: int = 0, n_rows: int = 0,
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
    K cap (round 4 update): bdr FITS to K=25 at t128 (calibration good
    entries) but measured SLOWER there than the one-hot ensemble kernel
    (91.6M vs 95.3M at N=131k) — resolve_stats_fn prefers bdr only to
    K<=20.  The round-3 "remote-compile 500" is a pinned body-size x
    grid-count compile-helper ceiling (t256/K25 compiles at 257 grid
    steps, fails at 384+; failures are clean JaxRuntimeErrors, no longer
    relay wedges); the failing shapes are calibration bad entries.
    """
    s = max(n_samples, 1)
    g = group or _pick_bdr_group(s, k)
    # Measured truth first: the on-chip calibration table
    # (ops/vmem_calibration.json, regenerated by tools/vmem_calibrate.py)
    # decides shapes it has seen — it both vetoes analytic-admitted shapes
    # that OOM on real hardware (the t256/K20/g2 trap) and admits shapes
    # the analytic caps below would refuse (e.g. probed-good K=25 bands).
    verdict = calibration.classify("bdr", n_genes, k, s, g, tile_b, n=n_rows)
    if verdict == calibration.BAD:
        return False
    if verdict == calibration.GOOD:
        return True
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
    n_genes: int, k: int, tile_b: int, n_samples: int = 1, group: int = 0,
    n_rows: int = 0,
) -> Optional[Tuple[int, int]]:
    """Largest (tile, group) the bdr envelope admits, or None.

    A user-forced group BELOW the measured-best pick is only admitted at a
    tile the calibration table has proven, because many-group concat
    pressure is non-monotone in the group width (t256/K20/g2 OOM'd on-chip
    inside the analytic envelope while g=5 runs — ADVICE r3).  Without a
    calibration entry the forced-narrow group drops one tile step below
    what the analytic envelope admits, the conservative direction.
    """
    s = max(n_samples, 1)
    picked = _pick_bdr_group(s, k)
    g = group or picked
    forced_narrow = bool(group) and group < picked
    t = tile_b
    while t >= 128:
        if bdr_kernel_fits(n_genes, k, t, n_samples, group=g, n_rows=n_rows):
            if forced_narrow and (
                calibration.classify("bdr", n_genes, k, s, g, t, n=n_rows)
                != calibration.GOOD
            ):
                t //= 2  # stricter bound: one halving below the envelope
                if t < 128 or not bdr_kernel_fits(
                    n_genes, k, t, n_samples, group=g, n_rows=n_rows
                ):
                    return None
            return t, g
        t //= 2
    return None


def _pallas_bdr_fn(
    tile_b: int, group: int = 0, strict: bool = False
) -> Callable:
    from trigenicinteractionpredictor_tpu.ops.pallas_em_bdr import (
        bdr_em_ensemble_stats,
    )

    fn = functools.partial(
        bdr_em_ensemble_stats, tile_b=tile_b, group=group, strict=strict
    )
    fn.ensemble = True
    fn.tile_b = tile_b
    fn.bdr_group = group
    fn.kernel_name = "pallas-bdr"
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


def bdrg_kernel_fits(
    n_genes: int, k: int, tile_b: int, n_samples: int = 1, group: int = 0,
    n_rows: int = 0,
) -> bool:
    """VMEM heuristic for the bdrg kernel (ops/pallas_em_bdrg.py).

    Per-grid-step working set is per-GROUP (S-independent); the dominant
    term is the ~5 live [Bt, gK2] slabs.  Measured-good anchors
    (on-chip 2026-08-20): K=50/g1 at t128 and t256; K=25/g5 at t256;
    K=25/g2 at t512; K=16,20/g1 at t256.  The calibration table
    (ops/vmem_calibration.json) overrides this model where it has
    entries.  Grid-streaming also sidesteps the bdr kernel's
    body-size x grid-count remote-compile ceiling — bdrg g=1 compiles at
    every probed K<=50 shape, and g=2 at K=50 hits the same compile 500
    the bdr family does (pinned in the bad entries).
    """
    s = max(n_samples, 1)
    g = group or 1
    verdict = calibration.classify("bdrg", n_genes, k, s, g, tile_b, n=n_rows)
    if verdict == calibration.BAD:
        return False
    if verdict == calibration.GOOD:
        return True
    if k > 64:
        # Measured compile frontier (2026-08-20): K=64 compiles at t64 and
        # runs 11.1M upd/s; K=80 throws the remote-compile 500 even at
        # t64.  Only a calibration GOOD entry (above) can extend this.
        return False
    gk2 = g * k * k
    slabs = 5 * tile_b * gk2 * 4
    onehot = 3 * tile_b * n_genes * 4
    pblocks = 4 * gk2 * g * k * 4          # pm + pkk, double-buffered
    return slabs <= int(16e6) and onehot <= int(8e6) and pblocks <= int(12e6)


def _fit_bdrg_tile(
    n_genes: int, k: int, tile_b: int, n_samples: int = 1, group: int = 0,
    n_rows: int = 0,
) -> Optional[Tuple[int, int]]:
    """Largest (tile, group) bdrg admits; tile floor 64 (the K>50 band's
    gK2-wide slabs push tiles below the usual 128 floor — fine for the
    8-sublane minimum)."""
    s = max(n_samples, 1)
    if group:
        g = group
    else:
        divs = [d for d in range(1, s + 1) if s % d == 0 and d * k <= 100]
        g = max(divs) if divs else 1
    t = tile_b
    while t >= 64:
        if bdrg_kernel_fits(n_genes, k, t, n_samples, group=g, n_rows=n_rows):
            return t, g
        t //= 2
    return None


def _pallas_bdrg_fn(
    tile_b: int, group: int = 1, strict: bool = False
) -> Callable:
    from trigenicinteractionpredictor_tpu.ops.pallas_em_bdrg import (
        bdrg_em_ensemble_stats,
    )

    fn = functools.partial(
        bdrg_em_ensemble_stats, tile_b=tile_b, group=group, strict=strict
    )
    fn.ensemble = True
    fn.tile_b = tile_b
    fn.bdr_group = group
    fn.kernel_name = "pallas-bdrg"
    fn.needs_rsort = True
    return fn


def _pallas_hybrid_fn(tile_b: int, strict: bool = False) -> Callable:
    from trigenicinteractionpredictor_tpu.ops.pallas_em_hybrid import (
        hybrid_em_ensemble_stats,
    )

    fn = functools.partial(
        hybrid_em_ensemble_stats, tile_b=tile_b, strict=strict
    )
    fn.ensemble = True
    fn.tile_b = tile_b
    fn.kernel_name = "pallas-hybrid"
    return fn


# Large-G path (ops/pallas_em_large.py): no G-sized kernel buffers, so the
# VMEM model only depends on (tile, K, S, wb).
_LARGE_G_WB = 512

# g1-fused bdg path (ops/pallas_em_bdg.py): position-1 theta block width.
# Measured (round-5 probe, 2026-08-21): wb1=512 beats 1024 and 2048 at
# every G in 10k..100k (126.8M vs 101.5M/119.2M at G=100k) — the narrow
# block keeps the local one-hot matmul overcompute at ~5% of the tile
# body while block-run padding stays tolerable.
_BDG_WB1 = 512

# bdg's g1 plan pads every gene-block run to a tile multiple, so pad rows
# grow ~ n_blocks1 * tile/2 — at G >> N*wb1/tile the padding swamps the
# fused-gather win and the UNPADDED bd-plan path wins again (measured at
# G=500k/N=131k: bd-plan 67.6M vs bdg 47.3M with 91% pad rows; at
# G=100k/14% pad bdg still wins 140M vs 124M).  Prefer bdg only while the
# expected pad fraction stays under this bound.
_BDG_MAX_PAD_FRAC = 0.25


def _bdg_pad_ok(n_genes: int, tile: int, n_rows: int) -> bool:
    n_eff = n_rows or 131072  # production assumption when N unknown
    pad_est = -(-n_genes // _BDG_WB1) * (tile // 2)
    return pad_est <= _BDG_MAX_PAD_FRAC * n_eff

# bdr vs plan-family crossover (re-measured same-session vs the round-5
# bdg champion, K=10/S=10/N=131k, 2026-08-21): bdr 195M vs bdg 174M at
# G=3000, a tie at G=4000 (170.1M vs 169.0M), bdg ahead from G=5000
# (164.4M vs 148.8M; 164.9M vs 123.2M at 6000).
_BDR_BD_PLAN_CROSSOVER_G = 4500


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


def bd_plan_kernel_fits(
    k: int, tile_b: int, n_samples: int = 1, n_genes: int = 0,
    n_ratings: int = 2, wb: int = _LARGE_G_WB, n_rows: int = 0,
) -> bool:
    """VMEM model for the bd-plan path (ops/pallas_em_bd.py): block-
    diagonal ensemble algebra between the XLA gather and the sorted-block
    plan scatter.  No G-sized kernel buffer, but the block-diagonal
    operands (Pm_bd [SK, R*SK2], selectors [SK, SK2]) and the cross
    output scale with S^2*K^3 — the ensemble-width cap.

    Measured-good anchor (on-chip 2026-08-20, round 4): t256/K10/S10 runs
    124.8M upd/s at G=100k (and 138-148M at G<=50k) through the
    production chained step — the round-3 runtime fault did NOT reproduce
    in 7 consecutive runs; see BASELINE.md round-4 large-G section.
    """
    s = max(n_samples, 1)
    # n_genes MUST be threaded by callers (ADVICE r4): querying at G=0
    # made every BAD entry recorded at large G unreachable (query G >=
    # entry G never held), silently disabling the table's veto for this
    # family.
    verdict = calibration.classify(
        "bd-plan", n_genes, k, s, s, tile_b, n=n_rows
    )
    if verdict == calibration.BAD:
        return False
    if verdict == calibration.GOOD:
        return True
    sk, sk2 = s * k, s * k * k
    r = max(n_ratings, 2)
    operands = (2 * sk * r * sk2 + 2 * sk * sk2) * 4      # Pm/Pkk + E1/E2 bd
    slabs = (tile_b * r * sk2 + 4 * tile_b * sk2) * 4     # T_all + 4 live
    streams = 6 * tile_b * sk * 4 * 2                     # th in + s out
    cross = sk2 * r * sk * 4 * 2
    scatter = tile_b * wb * 4 + wb * sk * 4 * 2 + tile_b * sk * 4 * 2
    return max(operands + slabs + streams + cross, scatter) < _VMEM_BUDGET


def _fit_bd_plan_tile(
    k: int, tile_b: int, n_samples: int = 1, n_genes: int = 0,
    n_rows: int = 0,
) -> Optional[int]:
    t = tile_b
    while t >= 128:
        if bd_plan_kernel_fits(k, t, n_samples, n_genes=n_genes,
                               n_rows=n_rows):
            return t
        t //= 2
    return None


def _pick_bd_plan_group(
    k: int, tile_b: int, n_samples: int, n_genes: int = 0, n_rows: int = 0
) -> Optional[Tuple[int, int]]:
    """(tile, group) for a restart-grouped bd-plan call: the widest group
    whose S^2*K^3 operands fit, preferring divisors of S (one compiled
    kernel instead of two).  The bd kernel has no unrolled restart loop,
    so unlike the one-hot family the cap is pure VMEM."""
    best = None
    for g in range(min(n_samples, 16), 1, -1):
        t = _fit_bd_plan_tile(k, tile_b, g, n_genes=n_genes, n_rows=n_rows)
        if t is None:
            continue
        if n_samples % g == 0:
            return t, g
        if best is None:
            best = (t, g)
    return best


def _pallas_bdg_plan_fn(
    tile_b: int, n_genes: int, strict: bool = False
) -> Callable:
    """g1-fused large-G variant (ops/pallas_em_bdg.py): the bd ensemble
    algebra with position 1's theta gather AND theta_hat scatter fused
    into the kernel as block-local one-hot matmuls (rows pre-sorted by
    position-1 gene block).  Round-5 race vs the bd-plan incumbent
    (N=131k, K=10, S=10, same session, 2026-08-21): 162.0M vs 143.6M at
    G=10k, 142.0M vs 122.5M at G=50k, 126.8M vs 123.8M at G=100k — the
    fused path deletes one of the three XLA row-gather passes and a
    third of the value-permute + scatter work that bound the sweep.

    VMEM admission reuses bd_plan_kernel_fits: the bdg working set adds
    only ~1.3 MB at wb1=512 (theta/theta_hat blocks + the local one-hot),
    inside the model's measured slack, and every probed admitted shape
    ran (BASELINE.md round-5 table)."""
    from trigenicinteractionpredictor_tpu.ops.pallas_em_bdg import (
        bdg_em_ensemble_stats,
    )

    n_blocks = -(-n_genes // _LARGE_G_WB)
    fn = functools.partial(
        bdg_em_ensemble_stats,
        tile_b=tile_b,
        wb1=_BDG_WB1,
        n_blocks1=-(-n_genes // _BDG_WB1),
        wb=_LARGE_G_WB,
        n_blocks=n_blocks,
        strict=strict,
    )
    fn.ensemble = True
    fn.tile_b = tile_b
    fn.wb = _LARGE_G_WB
    fn.wb1 = _BDG_WB1
    fn.kernel_name = "pallas-bdg-plan"
    fn.needs_g1plan = True  # trainer: g1 row order + 2-position scatter plan
    return fn


def _grouped_bd_plan_fn(
    tile_b: int, n_genes: int, group: int, strict: bool = False,
    wb: int = 0, g1_fused: bool = True,
) -> Callable:
    """Plan-family kernel over restart groups under lax.map (wide-S
    large-G band): full groups of ``group`` restarts per kernel call, a
    narrower remainder call for non-divisor S.  ``wb`` overrides the
    scatter block width (tests use small blocks).

    ``g1_fused`` (default, round 5) uses the bdg kernel per group —
    measured 188.7M upd/s at S=50/G=10k/g=10 vs the plain bd-plan
    grouped path's 172M (the round-4 record); False keeps the plain bd
    kernel (tests pin its parity independently)."""
    wb = wb or _LARGE_G_WB
    n_blocks = -(-n_genes // wb)
    if g1_fused:
        from trigenicinteractionpredictor_tpu.ops.pallas_em_bdg import (
            bdg_em_ensemble_stats,
        )

        call = functools.partial(
            bdg_em_ensemble_stats,
            tile_b=tile_b,
            wb1=_BDG_WB1,
            n_blocks1=-(-n_genes // _BDG_WB1),
            wb=wb,
            n_blocks=n_blocks,
            strict=strict,
        )
    else:
        from trigenicinteractionpredictor_tpu.ops.pallas_em_bd import (
            bd_em_ensemble_stats,
        )

        call = functools.partial(
            bd_em_ensemble_stats,
            tile_b=tile_b,
            wb=wb,
            n_blocks=n_blocks,
            strict=strict,
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
                lambda tp: call(tp[0], tp[1], batch), (th_g, p_g)
            )
            outs.append(
                jax.tree.map(
                    lambda x: x.reshape(n_full * group, *x.shape[2:]), stats
                )
            )
        if rem:
            outs.append(
                call(thetas[n_full * group :], ps[n_full * group :], batch)
            )
        if len(outs) == 1:
            return outs[0]
        return jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), *outs
        )

    fn.ensemble = True
    fn.tile_b = tile_b
    fn.wb = wb
    if g1_fused:
        fn.wb1 = _BDG_WB1
        fn.kernel_name = "pallas-bdg-plan-grouped"
        fn.needs_g1plan = True
    else:
        fn.kernel_name = "pallas-bd-plan-grouped"
        fn.needs_plan = True
    fn.strict = strict
    return fn


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
    precision: str = "fast",
    n_rows: int = 0,
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

    ``precision``: 'fast' (MXU DEFAULT, the measured-fastest mode) or
    'strict' (HIGHEST on every kernel matmul — the on-chip monotone-
    likelihood mode, EngineConfig.precision).

    ``n_rows`` (0 = unknown) is the per-shard dataset row count; the
    calibration table uses it to refuse GOOD verdicts probed at smaller
    N (the axon compile ceiling is grid-count-dependent — see
    ops/calibration.py).  Unknown keeps the production-N assumption.

    Every returned fn carries ``kernel_name``/``tile_b`` (and
    ``bdr_group`` on the bdr path) so the trainer can serialize the
    resolved dispatch decision into checkpoints and reports.
    """
    if precision not in ("fast", "strict"):
        raise ValueError(
            f"unknown engine precision {precision!r}; use 'fast' or 'strict'"
        )
    strict = precision == "strict"
    if bdr_group:
        s_dev = max(n_samples, 1)
        if bdr_group < 0 or s_dev % bdr_group != 0:
            raise ValueError(
                f"bdr_group={bdr_group} must be a positive divisor of the "
                f"per-device restart count {s_dev} (samples / ensemble-axis "
                "shards); pick a divisor or 0 for the measured-best rule"
            )
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
    # bdr-first only up to K=20: at K=25 the bdr kernel FITS (t128, see
    # the calibration table) but measured 91.6M upd/s vs the one-hot
    # ensemble kernel's 95.3M (N=131k, on-chip 2026-08-20) — sharing the
    # [Bt, G] one-hot matmuls across all S lanes is worth more than
    # removing rating masks once the K^2 algebra dominates.  The K-band
    # measurements are in BASELINE.md's round-4 table.
    #
    # ... and only up to G ~ 5000: bdr's [Bt, G] one-hot matmuls scale
    # its sweep with G (420M at G=1k -> 193M at 4k -> 135M at 6k -> 112M
    # at 8k) while the plan family is G-flat (round-4 crossover sweep;
    # round 5's g1-fused bdg runs it at 162M at G=10k / 140M at G=100k).
    # Past the crossover, prefer the plan family whenever it is actually
    # available (static rows + S >= 2); stepwise keeps bdr at any G its
    # envelope fits (the plans can't ride reshuffled minibatches).
    bd_plan_pick: Optional[Tuple[int, int]] = None  # (tile, group)
    if static_rows and n_samples >= 2:
        t_full = _fit_bd_plan_tile(
            k, tile_b, n_samples, n_genes=n_genes, n_rows=n_rows
        )
        if t_full is not None:
            bd_plan_pick = (t_full, n_samples)   # single whole-S call
        else:
            # Wide ensembles: bd-plan over restart groups under lax.map —
            # the kernel has no unrolled restart loop, so the group cap is
            # pure VMEM (the S^2*K^3 block-diagonal operands).
            bd_plan_pick = _pick_bd_plan_group(
                k, tile_b, n_samples, n_genes=n_genes, n_rows=n_rows
            )
    bdr_preferred = (
        n_genes <= _BDR_BD_PLAN_CROSSOVER_G or bd_plan_pick is None
    )
    if (static_rows or minibatch_rsort) and k <= 20 and bdr_preferred:
        fit = _fit_bdr_tile(
            n_genes, k, tile_b, n_samples, group=bdr_group, n_rows=n_rows
        )
        if fit is not None and (
            backend == "pallas" or jax.default_backend() == "tpu"
        ):
            tile_bdr, group_bdr = fit
            return _pallas_bdr_fn(tile_bdr, group=group_bdr, strict=strict)
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
                _fit_tile(n_genes, k, tile_b, group), group, strict=strict
            )
        tile = None  # fall through to single-restart kernel or jnp
    else:
        tile = _fit_tile(n_genes, k, tile_b, n_samples)
    # Large-K fallback: the S-wide ensemble kernel may not fit VMEM while
    # a small lane-group (or the single-restart kernel) does.  Grouped
    # first: sharing the [Bt, G] one-hot matmuls across a 2-lane group
    # measured 27.2M upd/s at K=50 x S=10 vs 26.2M per-restart (N=131k,
    # on-chip 2026-08-20) — and halves the dispatch count.  The
    # per-restart kernel remains for ensembles no group fits (measured
    # 20.4M triplets/s at K=50 vs 1.4M on the chunked jnp path).
    tile_g = group_g = None
    if tile is None and k >= 32 and n_samples >= 2:
        g_big = _pick_group(n_genes, k, tile_b, n_samples)
        if g_big is not None:
            tile_g = _fit_tile(n_genes, k, tile_b, g_big)
            group_g = g_big
    if tile_g is not None and (
        backend == "pallas" or jax.default_backend() == "tpu"
    ):
        return _pallas_grouped_fn(tile_g, group_g, strict=strict)
    tile1 = _fit_tile(n_genes, k, tile_b, 1) if tile is None and k >= 32 else None
    # The plan family next: the block-diagonal E-step between the XLA
    # gather and the plan scatter is G-FLAT — since round 5 served by the
    # g1-FUSED bdg kernel (position-1 gather/scatter fused as block-local
    # one-hot matmuls: 162M at G=10k, 140M at G=100k vs bd-plan's
    # 143.6M/123.8M same-session) — faster than hybrid (78-104M) and the
    # per-restart plan path (85-113M) everywhere both run.  Its S^2*K^3
    # operands cap the per-call ensemble width (wider ensembles run bdg
    # over restart groups); stepwise (reshuffled rows can't carry a
    # whole-dataset plan) falls through to hybrid / per-restart plan.
    tile_bd = None
    if (
        tile is None
        and tile1 is None
        and static_rows  # the scatter plan bakes a row order
        and n_samples >= 2
    ):
        tile_bd = bd_plan_pick
    # Mid-G fallback: the hybrid kernel (ops/pallas_em_hybrid.py) drops the
    # G-sized GATHER one-hots (XLA row-take instead), roughly doubling the
    # G ceiling; it now only serves shapes bd-plan cannot (stepwise, or
    # past the bd-plan ensemble-width cap).
    tile_h = None
    if (
        tile is None
        and tile1 is None
        and tile_bd is None
        and n_samples <= _MAX_ENSEMBLE_GROUP
    ):
        tile_h = _fit_hybrid_tile(n_genes, k, tile_b, n_samples)
    # Large-G fallback: the one-hot kernels are G-capped by their [Bt, G]
    # VMEM one-hots; the pre-gathered + sorted-block-scatter path
    # (ops/pallas_em_large.py) has no G-sized buffer, at the cost of a
    # host-built scatter plan (Batch.scatter_*; the trainer attaches one
    # when this fn's .needs_plan is set).  Serves what bd-plan and hybrid
    # cannot (e.g. large G at S=1); capped at the Mosaic program-size
    # ensemble width.
    tile_lg = None
    if (
        tile is None
        and tile1 is None
        and tile_bd is None
        and tile_h is None
        and static_rows  # the scatter plan bakes a row order too
        and n_samples <= _MAX_ENSEMBLE_GROUP
    ):
        tile_lg = _fit_large_tile(k, tile_b, n_samples)
    # K > 50 tail: when even the per-restart kernel blows VMEM (K ~ 80)
    # the jnp row-chunk fallback runs ~1.4M upd/s (K=50 measurement).
    # The bdrg kernel (restart groups on the grid, per-group working set)
    # covers this band at g=1 tiles down to 64 rows — see the BASELINE.md
    # round-4 K-band table for the measured rates.  Needs rating-sorted
    # rows (same contract as bdr).
    tile_brg = None
    if (
        tile is None
        and tile1 is None
        and tile_h is None
        and tile_lg is None
        and k > 50
        and (static_rows or minibatch_rsort)
    ):
        tile_brg = _fit_bdrg_tile(
            n_genes, k, tile_b, n_samples, group=bdr_group, n_rows=n_rows
        )
    if backend == "pallas":
        if tile is not None:
            return _pallas_fn(tile, strict=strict)
        if tile1 is not None:
            return _pallas_single_fn(tile1, strict=strict)
        if tile_h is not None:
            return _pallas_hybrid_fn(tile_h, strict=strict)
        if tile_bd is not None:
            t_bd, g_bd = tile_bd
            fused = _bdg_pad_ok(n_genes, t_bd, n_rows)
            if g_bd == n_samples:
                # Full-S: the g1-fused bdg path (round-5 winner, see
                # _pallas_bdg_plan_fn) replaces the plain bd-plan call —
                # unless its block-run padding would swamp the win.
                if fused:
                    return _pallas_bdg_plan_fn(t_bd, n_genes, strict=strict)
                return _pallas_bd_plan_fn(t_bd, n_genes, strict=strict)
            return _grouped_bd_plan_fn(
                t_bd, n_genes, g_bd, strict=strict, g1_fused=fused
            )
        if tile_lg is not None:
            return _pallas_large_fn(tile_lg, n_genes, strict=strict)
        if tile_brg is not None:
            return _pallas_bdrg_fn(tile_brg[0], tile_brg[1], strict=strict)
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
            return _pallas_fn(tile, strict=strict)
        if tile1 is not None:
            return _pallas_single_fn(tile1, strict=strict)
        if tile_h is not None:
            return _pallas_hybrid_fn(tile_h, strict=strict)
        if tile_bd is not None:
            t_bd, g_bd = tile_bd
            fused = _bdg_pad_ok(n_genes, t_bd, n_rows)
            if g_bd == n_samples:
                if fused:
                    return _pallas_bdg_plan_fn(t_bd, n_genes, strict=strict)
                return _pallas_bd_plan_fn(t_bd, n_genes, strict=strict)
            return _grouped_bd_plan_fn(
                t_bd, n_genes, g_bd, strict=strict, g1_fused=fused
            )
        if tile_lg is not None:
            return _pallas_large_fn(tile_lg, n_genes, strict=strict)
        if tile_brg is not None:
            return _pallas_bdrg_fn(tile_brg[0], tile_brg[1], strict=strict)
    return None


def _pallas_fn(tile_b: int, strict: bool = False) -> Callable:
    from trigenicinteractionpredictor_tpu.ops.pallas_em import (
        pallas_em_ensemble_stats,
    )

    fn = functools.partial(
        pallas_em_ensemble_stats, tile_b=tile_b, strict=strict
    )
    fn.ensemble = True  # one call with stacked restarts (sharded_em.py)
    fn.tile_b = tile_b
    fn.kernel_name = "pallas-onehot-ensemble"
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


def _pallas_grouped_fn(
    tile_b: int, group: int, strict: bool = False
) -> Callable:
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
                    tp[0], tp[1], batch, tile_b=tile_b, strict=strict
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
                    strict=strict,
                )
            )
        if len(outs) == 1:
            return outs[0]
        return jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), *outs
        )

    fn.ensemble = True  # takes stacked restarts in one call
    fn.tile_b = tile_b
    fn.kernel_name = "pallas-onehot-grouped"
    fn.strict = strict  # closure, not a partial — expose for introspection
    return fn


def _pallas_bd_plan_fn(
    tile_b: int, n_genes: int, strict: bool = False
) -> Callable:
    """Large-G variant with the block-diagonal E-step: bd algebra between
    the XLA gather and the sorted-block plan scatter (ops/pallas_em_bd.py).
    Same Batch contract as the plan path (needs_plan).

    Round-3 parked this path after a runtime fault killed the relay-side
    TPU worker twice at G=100k.  Round 4 (2026-08-20) re-ran it 7x at
    G=4k..100k plus an end-to-end fit() without a single fault, at
    124.8M upd/s (G=100k) vs the per-restart plan path's 85.2M — so it
    is the large-G dispatch default again; the per-restart plan path
    remains the fallback for ensemble widths past its S^2 operand cap."""
    from trigenicinteractionpredictor_tpu.ops.pallas_em_bd import (
        bd_em_ensemble_stats,
    )

    n_blocks = -(-n_genes // _LARGE_G_WB)
    fn = functools.partial(
        bd_em_ensemble_stats,
        tile_b=tile_b,
        wb=_LARGE_G_WB,
        n_blocks=n_blocks,
        strict=strict,
    )
    fn.ensemble = True
    fn.tile_b = tile_b
    fn.wb = _LARGE_G_WB
    fn.kernel_name = "pallas-bd-plan"
    fn.needs_plan = True
    return fn


def _pallas_large_fn(
    tile_b: int, n_genes: int, strict: bool = False
) -> Callable:
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
        strict=strict,
    )
    fn.ensemble = True
    fn.tile_b = tile_b
    fn.wb = _LARGE_G_WB
    fn.kernel_name = "pallas-large-g"
    fn.needs_plan = True
    return fn


def _pallas_single_fn(tile_b: int, strict: bool = False) -> Callable:
    """Per-restart kernel (no .ensemble attr -> mapped by the caller)."""
    from trigenicinteractionpredictor_tpu.ops.pallas_em import (
        pallas_em_sufficient_stats,
    )

    fn = functools.partial(
        pallas_em_sufficient_stats, tile_b=tile_b, strict=strict
    )
    fn.tile_b = tile_b
    fn.kernel_name = "pallas-onehot-single"
    return fn
