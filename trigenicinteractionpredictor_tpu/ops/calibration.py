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

Shape = Tuple[int, int, int, int, int]  # (G, K, S, group, tile)


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
    family: str, g: int, k: int, s: int, group: int, tile: int
) -> str:
    """GOOD / BAD / UNKNOWN for one (family, shape) query."""
    table = _load().get(family)
    if not table:
        return UNKNOWN
    for eg, ek, es, egr, et in table.get(BAD, ()):  # bad first: it vetoes
        if ek == k and egr == group and g >= eg and s >= es and tile >= et:
            return BAD
    for eg, ek, es, egr, et in table.get(GOOD, ()):
        if ek == k and egr == group and g <= eg and s <= es and tile <= et:
            return GOOD
    return UNKNOWN


def record(
    family: str, shape: Shape, ok: bool, path: Optional[str] = None
) -> None:
    """Append one probe result (used by tools/vmem_calibrate.py)."""
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
