"""On-chip VMEM calibration table for the Pallas kernel dispatch.

The dispatch envelopes (ops/dispatch.py *_kernel_fits) are analytic
models of Mosaic's scoped-VMEM behavior, calibrated by hand against a
fixed set of measured shapes — and round 3 pinned one shape
(t256/K20/g2) that OOMs *inside* the bdr envelope, because many-group
concat pressure is not monotone in the group width.  This module makes
measured truth the authority: `tools/vmem_calibrate.py` compile-probes a
(G, K, S, g, tile) grid on the real chip through tools/tpu_worker.py and
writes `ops/vmem_calibration.json`; dispatch consults the table first
and falls back to the analytic envelope only for shapes the table does
not decide.

Dominance rules (what one measured shape proves about another), for a
fixed kernel family and fixed (K, group):

- VMEM residency is monotone in G (gene-sized buffers), S (ensemble
  streams at fixed group), and tile (every [Bt, *] slab).  So a
  measured-GOOD shape proves every shape with smaller-or-equal G, S and
  tile; a measured-BAD shape condemns every shape with larger-or-equal
  G, S and tile.
- Nothing is assumed across K or group: K changes every K^2/K^3 buffer
  super-linearly, and group width is measurably NON-monotone (the
  t256/K20/g2 trap).
- Dataset size N (round 5, ADVICE r4): the axon compile helper has a
  body-size x grid-count ceiling, so compile success is N-DEPENDENT
  (bdr t256/K25 compiles at N=65k, 500s at 98k+).  Entries may carry a
  sixth element, the probe N; a GOOD entry proves only queries with
  n <= probe N (more rows = more grid steps = closer to the ceiling).
  Legacy 5-element GOOD entries were all probed at N=131072
  (tools/vmem_calibrate.py's hard-coded probe size).  BAD entries stay
  N-INDEPENDENT vetoes regardless of their probe N: the truncated
  HTTP-500 detail cannot distinguish a VMEM OOM (N-independent) from
  the compile ceiling (N-dependent), and over-vetoing a small dataset
  merely falls back to the next kernel family / the analytic envelope,
  while under-vetoing would OOM at runtime.

When the table is absent (fresh checkout, non-TPU CI) every query
returns UNKNOWN and dispatch behaves exactly as before.
"""

from __future__ import annotations

import json
import os
import threading
from typing import Dict, List, Optional, Tuple

GOOD = "good"
BAD = "bad"
UNKNOWN = "unknown"

_CAL_PATH = os.path.join(os.path.dirname(__file__), "vmem_calibration.json")
_lock = threading.Lock()
_cache: Optional[Dict] = None
_cache_mtime: Optional[float] = None

Shape = Tuple[int, ...]  # (G, K, S, group, tile[, probe_n])

# Every pre-round-5 probe ran at this dataset size (tools/vmem_calibrate.py
# JOB_TEMPLATE); 5-element GOOD entries are interpreted as probed here.
LEGACY_PROBE_N = 131072


def _load() -> Dict:
    """Lazy-load + mtime-refresh the calibration table (tests rewrite it)."""
    global _cache, _cache_mtime
    with _lock:
        try:
            mtime = os.path.getmtime(_CAL_PATH)
        except OSError:
            _cache, _cache_mtime = {}, None
            return _cache
        if _cache is None or mtime != _cache_mtime:
            try:
                with open(_CAL_PATH) as fh:
                    _cache = json.load(fh)
            except (OSError, json.JSONDecodeError):
                _cache = {}
            _cache_mtime = mtime
        return _cache


def classify(
    family: str, g: int, k: int, s: int, group: int, tile: int, n: int = 0
) -> str:
    """GOOD / BAD / UNKNOWN for one (family, shape) query.

    ``n`` is the dataset row count (post-padding); 0 = unknown, treated
    as the production probe size so callers that do not know N keep the
    pre-round-5 behavior exactly.
    """
    table = _load().get(family)
    if not table:
        return UNKNOWN
    qn = n or LEGACY_PROBE_N
    for e in table.get(BAD, ()):  # bad first: it vetoes; N-independent
        eg, ek, es, egr, et = e[:5]
        if ek == k and egr == group and g >= eg and s >= es and tile >= et:
            return BAD
    for e in table.get(GOOD, ()):
        eg, ek, es, egr, et = e[:5]
        en = e[5] if len(e) > 5 else LEGACY_PROBE_N
        if (
            ek == k and egr == group and g <= eg and s <= es
            and tile <= et and qn <= en
        ):
            return GOOD
    return UNKNOWN


def record(
    family: str, shape: Shape, ok: bool, path: Optional[str] = None
) -> None:
    """Append one probe result (used by tools/vmem_calibrate.py).

    ``shape`` is (G, K, S, group, tile) or, for GOOD entries, optionally
    (G, K, S, group, tile, probe_n) — see the module docstring's N rule.
    """
    path = path or _CAL_PATH
    try:
        with open(path) as fh:
            table = json.load(fh)
    except (OSError, json.JSONDecodeError):
        table = {}
    fam = table.setdefault(family, {})
    key = GOOD if ok else BAD
    entries: List[List[int]] = fam.setdefault(key, [])
    entry = list(shape)
    if entry not in entries:
        entries.append(entry)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(table, fh, indent=1, sort_keys=True)
    os.replace(tmp, path)
    global _cache, _cache_mtime
    with _lock:
        _cache = None  # force reload


def calibration_path() -> str:
    return _CAL_PATH
