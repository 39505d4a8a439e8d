"""ctypes binding for the native Kuzmin TSV parser.

The C++ library is the fast path for large Data-S1 files; data/kuzmin.py
remains the semantic source of truth and the always-available fallback.
The library is built on demand (``make`` + g++, both baked into the image)
into ``native/build/libtipnative.so``; any build or load failure simply
disables the fast path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "build", "libtipnative.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_SO):
            try:
                subprocess.run(
                    ["make", "-C", _DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None
        lib.tip_parse_kuzmin.restype = ctypes.c_void_p
        lib.tip_parse_kuzmin.argtypes = [
            ctypes.c_char_p,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.c_int,
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.tip_result_n_rows.restype = ctypes.c_int64
        lib.tip_result_n_rows.argtypes = [ctypes.c_void_p]
        lib.tip_result_names.restype = ctypes.c_char_p
        lib.tip_result_names.argtypes = [ctypes.c_void_p]
        lib.tip_result_labels.restype = ctypes.POINTER(ctypes.c_int32)
        lib.tip_result_labels.argtypes = [ctypes.c_void_p]
        lib.tip_result_error.restype = ctypes.c_char_p
        lib.tip_result_error.argtypes = [ctypes.c_void_p]
        lib.tip_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def parse_kuzmin_file(path, cfg) -> Optional[List[Tuple[str, str, str, int]]]:
    """Parse via the native library; None if unavailable.

    Raises ValueError with the same message class as the Python parser on
    missing columns.
    """
    lib = _load()
    if lib is None:
        return None
    handle = lib.tip_parse_kuzmin(
        os.fspath(path).encode(),
        float(cfg.p_cutoff),
        float(cfg.tau_cutoff),
        1 if cfg.tau_mode == "negative" else 0,
        (cfg.mutant_type or "").encode(),
        1 if cfg.strip_allele_suffix else 0,
        1 if cfg.deduplicate else 0,
    )
    if not handle:
        return None
    try:
        err = lib.tip_result_error(handle)
        if err:
            raise ValueError(err.decode())
        n = lib.tip_result_n_rows(handle)
        if n == 0:
            return []
        labels_ptr = lib.tip_result_labels(handle)
        # Single memcpy; a per-element ctypes loop costs hundreds of ms at
        # Data S1 scale and defeats the point of the native parser.
        labels = np.ctypeslib.as_array(labels_ptr, shape=(n,)).copy()
        names_blob = lib.tip_result_names(handle).decode()
        rows: List[Tuple[str, str, str, int]] = []
        for line, lab in zip(names_blob.splitlines(), labels):
            a, b, c = line.split("\t")
            rows.append((a, b, c, int(lab)))
        return rows
    finally:
        lib.tip_free(handle)
