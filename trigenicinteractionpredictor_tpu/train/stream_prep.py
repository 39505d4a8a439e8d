"""Host-side minibatch preparation for stepwise/streaming EM.

The beyond-HBM streaming path (train/trainer.py::_run_stepwise) is
HOST-bound: at 10^7 memmapped rows the round-4 pipeline spent ~9.6x the
device time per epoch on one Python thread doing epoch-permutation
generation, row gather, and a per-minibatch Python rating-sort loop
(tools/stepwise_host_cost.py; VERDICT r4 item 3).  This module replaces
all three stages:

1. **Sliced Feistel permutation** (:func:`epoch_perm_slice`) — the epoch
   shuffle becomes a format-preserving 4-round Feistel bijection over the
   padded index space, derived from (seed, epoch).  Any slice of the
   permutation is computable independently in O(slice) time and O(1)
   memory, so (a) the serial O(N) ``rng.permutation`` materialization is
   gone, and (b) pool workers compute their own index ranges with zero
   parent->worker data traffic.  Replayability across resume is preserved:
   the permutation is a pure function of (seed, epoch, n).

2. **Vectorized rating-sort** (:func:`rsort_pad_group`) — one stable
   argsort + O(R) vectorized passes over a whole dispatch group replaces
   ``group`` x ``n_shards`` per-minibatch ``rating_sort_pad`` calls.
   Exactly equivalent (tests/test_stream_prep.py asserts array equality
   against the reference implementation).

3. **Process-pool fan-out** (:class:`StreamPrep`) — gather + sort scale
   across cores: spawn-based workers (env-scrubbed so the axon
   sitecustomize cannot claim the TPU in a child) write prepared
   minibatches straight into double-buffered shared-memory slots; the
   parent only device_puts.  Memmap-backed datasets are reopened by path
   in each worker (independent page-cache reads); in-memory datasets ship
   once at pool startup.  With few cores or small datasets the pool is
   skipped automatically — the vectorized in-thread path is used.

This module is imported by spawn workers, so it must NOT import jax (or
anything that does) at module scope.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

# ----------------------------------------------------------------------
# 1. Sliced epoch permutation (Feistel cycle-walking bijection)
# ----------------------------------------------------------------------

_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)
_ROUNDS = 4


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (vectorized, uint64 wrap-around)."""
    x = (x ^ (x >> np.uint64(30))) * _M1
    x = (x ^ (x >> np.uint64(27))) * _M2
    return x ^ (x >> np.uint64(31))


def _round_keys(seed: int, epoch: int) -> np.ndarray:
    # 64-bit wrap-around is intended; do the scalar mix in Python ints.
    base = (
        ((seed ^ 0x5EED) & 0xFFFFFFFF) * 0x9E3779B97F4A7C15 + epoch + 1
    ) & 0xFFFFFFFFFFFFFFFF
    return _mix64(np.uint64(base) + np.arange(1, _ROUNDS + 1, dtype=np.uint64))


def epoch_perm_slice(
    seed: int, epoch: int, n: int, lo: int, hi: int
) -> np.ndarray:
    """Positions ``lo:hi`` of the (seed, epoch) permutation of ``[0, n)``.

    A 4-round Feistel network over the smallest even-split power-of-two
    domain >= n, restricted to [0, n) by cycle-walking — a standard
    format-preserving-encryption construction, giving a deterministic
    bijection computable slice-by-slice.  ``epoch_perm_slice(s, e, n, 0,
    n)`` is the full permutation; disjoint slices partition it.
    """
    if hi <= lo:
        return np.empty(0, np.int64)
    assert 0 <= lo and hi <= n, (lo, hi, n)
    bits = max(2, int(n - 1).bit_length())
    half = np.uint64((bits + 1) // 2)
    mask = np.uint64((1 << int(half)) - 1)
    keys = _round_keys(seed, epoch)

    def encrypt(v: np.ndarray) -> np.ndarray:
        left = v >> half
        right = v & mask
        for r in range(_ROUNDS):
            left, right = right, left ^ (_mix64(right + keys[r]) & mask)
        return (left << half) | right

    out = np.arange(lo, hi, dtype=np.uint64)
    active = np.ones(out.shape, bool)
    while active.any():
        out[active] = encrypt(out[active])
        active = out >= np.uint64(n)  # cycle-walk until back in range
    return out.astype(np.int64)


# ----------------------------------------------------------------------
# 2. Vectorized per-group rating sort
# ----------------------------------------------------------------------


def rsort_pad_group(
    trip: np.ndarray,     # int32 [g*mb, arity]
    rat: np.ndarray,      # int32 [g*mb]
    wts: np.ndarray,      # f32  [g*mb]
    *,
    group: int,
    n_ratings: int,
    tile: int,
    n_shards: int,
    n_tiles: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Rating-sort + class-pad every minibatch of a dispatch group at once.

    Exactly equivalent to looping ``rating_sort_pad`` +
    ``apply_rating_sort`` over the group's minibatches with a forced
    ``n_tiles`` (the stepwise trainer's fixed worst-case layout), but
    with ONE stable argsort over all (minibatch, shard) rows and O(R)
    vectorized bookkeeping instead of a Python loop
    (tests/test_stream_prep.py proves equality).

    Returns (trip_g [g, mb_b, arity], rat_g [g, mb_b], wts_g [g, mb_b],
    tile_r [g, n_shards*n_tiles]) with mb_b = n_shards*n_tiles*tile.
    """
    mb = rat.shape[0] // group
    B = mb // n_shards
    rows = group * n_shards
    Bp = n_tiles * tile
    R = n_ratings

    r2 = rat.reshape(rows, B)
    order_in = np.argsort(r2, axis=1, kind="stable")
    r_sorted = np.take_along_axis(r2, order_in, axis=1)

    flat = (np.arange(rows, dtype=np.int64)[:, None] * R + r2).ravel()
    counts = np.bincount(flat, minlength=rows * R).reshape(rows, R)
    tiles_per_class = np.maximum(1, -(-counts // tile))
    assert int(tiles_per_class.sum(1).max()) <= n_tiles, (
        "forced n_tiles too small for a minibatch's class layout"
    )
    excl = np.zeros((rows, R), np.int64)
    excl[:, 1:] = np.cumsum(counts, axis=1)[:, :-1]
    starts = np.zeros((rows, R), np.int64)
    starts[:, 1:] = np.cumsum(tiles_per_class * tile, axis=1)[:, :-1]

    j = np.arange(B, dtype=np.int64)[None, :]
    dest = (
        j
        - np.take_along_axis(excl, r_sorted, axis=1)
        + np.take_along_axis(starts, r_sorted, axis=1)
    )
    order = np.full((rows, Bp), -1, np.int64)
    np.put_along_axis(order, dest, order_in, axis=1)

    # tile -> rating class: boundaries are monotone (every class owns >= 1
    # tile), so a tile's class = number of class starts <= its index;
    # common-length padding tiles past the last class inherit class R-1,
    # matching rating_sort_pad.
    tt = np.arange(n_tiles, dtype=np.int64)[None, :]
    start_tiles = starts // tile
    tile_r = np.zeros((rows, n_tiles), np.int32)
    for rr in range(1, R):
        tile_r += (tt >= start_tiles[:, rr : rr + 1]).astype(np.int32)

    pad = order < 0
    idx = np.where(pad, 0, order)
    trip3 = trip.reshape(rows, B, -1)
    trip_out = np.take_along_axis(trip3, idx[:, :, None], axis=1)
    wts_out = np.where(
        pad, np.float32(0), np.take_along_axis(wts.reshape(rows, B), idx, axis=1)
    ).astype(np.float32)
    rat_out = np.repeat(tile_r, tile, axis=1).astype(np.int32)

    arity = trip.shape[-1]
    return (
        trip_out.reshape(group, n_shards * Bp, arity),
        rat_out.reshape(group, n_shards * Bp),
        wts_out.reshape(group, n_shards * Bp),
        tile_r.reshape(group, n_shards * n_tiles),
    )


# ----------------------------------------------------------------------
# 3. The prep engine: gather (+sort) one dispatch group
# ----------------------------------------------------------------------


def _gather_rows(ds_arrays, n: int, idx: np.ndarray):
    """Rows for padded-index-space ``idx``; indices >= n are inert padding
    (gene 0, rating 0, weight 0 — bit-identical to pad_to())."""
    triplets, ratings, weights = ds_arrays
    arity = triplets.shape[1]
    mask = idx < n
    src = idx[mask]
    trip = np.zeros((idx.size, arity), np.int32)
    rat = np.zeros(idx.size, np.int32)
    wts = np.zeros(idx.size, np.float32)
    trip[mask] = triplets[src]
    rat[mask] = ratings[src]
    wts[mask] = weights[src]
    return trip, rat, wts


def _prep_minibatches(
    ds_arrays, layout: Dict, ep: int, d: int, m_lo: int, m_hi: int
):
    """Gather + (optionally) rating-sort minibatches [m_lo, m_hi) of
    dispatch group ``d`` of epoch ``ep``.  Pure numpy; runs on the
    prefetch thread or inside a pool worker."""
    mb = layout["mb"]
    lo = (d * layout["group"] + m_lo) * mb
    hi = (d * layout["group"] + m_hi) * mb
    gperm = epoch_perm_slice(
        layout["seed"], ep, layout["n_padded"], lo, hi
    )
    trip, rat, wts = _gather_rows(ds_arrays, layout["n"], gperm)
    g = m_hi - m_lo
    if layout["rsort"]:
        return rsort_pad_group(
            trip, rat, wts,
            group=g,
            n_ratings=layout["n_ratings"],
            tile=layout["tile"],
            n_shards=layout["n_shards"],
            n_tiles=layout["n_tiles"],
        )
    arity = trip.shape[-1]
    return (
        trip.reshape(g, mb, arity),
        rat.reshape(g, mb),
        wts.reshape(g, mb),
        None,
    )


# --- pool worker side --------------------------------------------------

_W_DS = None       # (triplets, ratings, weights) arrays in this worker
_W_LAYOUT = None
_W_SHM: Dict[str, object] = {}


def _worker_init(ds_ref, layout):
    """Pool initializer: open the dataset (by memmap path or shipped
    arrays) once per worker."""
    global _W_DS, _W_LAYOUT
    kind, payload = ds_ref
    if kind == "mmap":
        _W_DS = tuple(np.load(p, mmap_mode="r") for p in payload)
    else:
        _W_DS = payload
    _W_LAYOUT = layout


def _attach_shm(name: str):
    from multiprocessing import shared_memory

    shm = _W_SHM.get(name)
    if shm is None:
        shm = shared_memory.SharedMemory(name=name)
        _W_SHM[name] = shm
    return shm


def _worker_task(slot_spec, ep: int, d: int, m_lo: int, m_hi: int):
    """Prep a minibatch range and write it into the shared-memory slot.

    ``slot_spec``: {array_name: (shm_name, shape, dtype_str)} for the
    whole group; this task writes rows [m_lo:m_hi) of the leading axis.
    """
    out = _prep_minibatches(_W_DS, _W_LAYOUT, ep, d, m_lo, m_hi)
    names = ("trip", "rat", "wts", "tiler")
    for name, arr in zip(names, out):
        if arr is None:
            continue
        shm_name, shape, dtype = slot_spec[name]
        dst = np.ndarray(shape, dtype=dtype, buffer=_attach_shm(shm_name).buf)
        dst[m_lo:m_hi] = arr
    return None


# --- parent side -------------------------------------------------------


class StreamPrep:
    """Prepares one dispatch group of minibatches per call, returning
    device arrays (a Batch is assembled by the trainer).

    Modes:
    - in-thread: vectorized gather+sort on the calling (prefetch) thread;
    - pool: ``workers`` spawn processes write into one of two
      shared-memory slots (double-buffered for the one-group lookahead);
      the parent device_puts straight from the slot views, blocking on
      the slot's PREVIOUS transfer before reuse.

    ``workers=0`` auto-selects: a pool only helps when there are spare
    cores beyond the parent/prefetch threads and enough rows per group to
    amortize task dispatch.
    """

    def __init__(
        self,
        ds,                      # TripletDataset (possibly memmap-backed)
        layout: Dict,            # see _run_stepwise for keys
        sharding=None,           # jax sharding for device_put (or None)
        workers: int = 0,
    ):
        self._ds_arrays = (ds.triplets, ds.ratings, ds.weights)
        self._layout = dict(layout)
        self._sharding = sharding
        self._pool = None
        self._slots = []         # [{name: (shm, np view)}] x 2
        self._slot_busy: list = [None, None]  # previous device arrays
        self._toggle = 0
        if workers == 0:
            cpus = os.cpu_count() or 1
            rows_per_group = layout["group"] * layout["mb"]
            workers = (
                min(4, cpus - 2)
                if cpus >= 4 and rows_per_group >= 1 << 20
                else 1
            )
        self._workers = max(1, workers)
        if self._workers > 1:
            self._start_pool()

    # -- pool management ------------------------------------------------

    def _ds_ref(self):
        arrs = self._ds_arrays
        if all(isinstance(a, np.memmap) for a in arrs) and all(
            getattr(a, "filename", None) for a in arrs
        ):
            return ("mmap", [a.filename for a in arrs])
        return ("arrays", arrs)  # shipped once per worker at spawn

    def _start_pool(self):
        from concurrent.futures import ProcessPoolExecutor
        from multiprocessing import get_context

        # Scrub the axon claim triggers from the env the children inherit:
        # the sitecustomize would otherwise try to claim the TPU in every
        # worker (workers are numpy-only).
        saved = {}
        for var in ("PALLAS_AXON_POOL_IPS",):
            if var in os.environ:
                saved[var] = os.environ.pop(var)
        os.environ["JAX_PLATFORMS"] = "cpu"
        try:
            self._pool = ProcessPoolExecutor(
                max_workers=self._workers,
                mp_context=get_context("spawn"),
                initializer=_worker_init,
                initargs=(self._ds_ref(), self._layout),
            )
            # Force worker startup now (surfaces spawn failures here, and
            # pays the import cost before the first epoch's clock starts).
            list(
                self._pool.map(
                    _noop, range(self._workers), chunksize=1
                )
            )
        except Exception:
            if self._pool is not None:
                self._pool.shutdown(wait=False)
            self._pool = None
            self._workers = 1
        finally:
            os.environ.pop("JAX_PLATFORMS", None)
            os.environ.update(saved)

    def _slot(self, i: int):
        """Lazily create shared-memory slot i sized for one group."""
        from multiprocessing import shared_memory

        while len(self._slots) <= i:
            lay = self._layout
            g, mb_b, arity = lay["group"], lay["mb_b"], lay["arity"]
            spec = {
                "trip": ((g, mb_b, arity), np.int32),
                "rat": ((g, mb_b), np.int32),
                "wts": ((g, mb_b), np.float32),
            }
            if lay["rsort"]:
                spec["tiler"] = (
                    (g, lay["n_shards"] * lay["n_tiles"]), np.int32
                )
            slot = {}
            for name, (shape, dtype) in spec.items():
                nbytes = int(np.prod(shape)) * np.dtype(dtype).itemsize
                shm = shared_memory.SharedMemory(create=True, size=nbytes)
                slot[name] = (
                    shm, np.ndarray(shape, dtype=dtype, buffer=shm.buf)
                )
            self._slots.append(slot)
        return self._slots[i]

    # -- the public call ------------------------------------------------

    def prep_group(self, ep: int, d: int):
        """Return {trip, rat, wts, tiler?} as DEVICE arrays for one
        dispatch group (tiler only in rsort mode)."""
        import jax

        lay = self._layout
        if self._pool is None:
            trip, rat, wts, tiler = _prep_minibatches(
                self._ds_arrays, lay, ep, d, 0, lay["group"]
            )
        else:
            slot_i = self._toggle
            self._toggle ^= 1
            slot = self._slot(slot_i)
            if self._slot_busy[slot_i] is not None:
                # The slot's previous group may still be in host->device
                # transfer; device_put sources must not be overwritten
                # until the device buffers exist.
                jax.block_until_ready(self._slot_busy[slot_i])
                self._slot_busy[slot_i] = None
            spec = {
                name: (shm.name, view.shape, view.dtype.str)
                for name, (shm, view) in slot.items()
            }
            g = lay["group"]
            per = -(-g // self._workers)
            futs = [
                self._pool.submit(
                    _worker_task, spec, ep, d, m, min(m + per, g)
                )
                for m in range(0, g, per)
            ]
            for f in futs:
                f.result()  # propagate worker exceptions
            trip = slot["trip"][1]
            rat = slot["rat"][1]
            wts = slot["wts"][1]
            tiler = slot["tiler"][1] if "tiler" in slot else None
        put = (
            (lambda a: jax.device_put(a, self._sharding))
            if self._sharding is not None
            else jax.device_put
        )
        out = {"trip": put(trip), "rat": put(rat), "wts": put(wts)}
        if tiler is not None:
            out["tiler"] = put(tiler)
        if self._pool is not None:
            self._slot_busy[self._toggle ^ 1] = list(out.values())
        return out

    def close(self):
        if self._pool is not None:
            self._pool.shutdown(wait=False)
            self._pool = None
        for slot in self._slots:
            for shm, _ in slot.values():
                try:
                    shm.close()
                    shm.unlink()
                except Exception:
                    pass
        self._slots = []


def _noop(_):
    return None
