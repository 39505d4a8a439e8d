"""Host-side minibatch preparation for stepwise/streaming EM.

The beyond-HBM streaming path (train/trainer.py::_run_stepwise) is
HOST-bound: at 10^7 memmapped rows the round-4 pipeline spent ~9.6x the
device time per epoch on one Python thread doing epoch-permutation
generation, row gather, and per-minibatch rating-sorting
(tools/stepwise_host_cost.py; VERDICT r4 item 3).  This module is the
round-5 rework.  Two designs were MEASURED OUT first (pinned in
BASELINE.md round-5): a sliced Feistel permutation (slice-computable,
O(1) memory — but 2.5-5.3 s/10^7 rows of numpy uint ops vs 0.37 s for
``rng.permutation``: elementwise chains lose to the native shuffle) and a
fully vectorized group rating-sort (2x SLOWER than the existing
per-minibatch loop, which never scatters — at stream_groups <= 64 the
Python loop overhead the vectorization targeted is negligible).

What ships instead:

1. The epoch permutation keeps round 4's exact (seed, epoch) RNG
   derivation (replayable across resume, bit-compatible with round-4
   checkpoints) but is drawn as int32 (half the memory) and computed on
   the PREFETCH thread — and, in pool mode, precomputed for epoch e+1
   while the last group of epoch e is being prepped by workers, taking
   its O(N) cost off the critical path entirely.

2. **Process-pool fan-out** (:class:`StreamPrep`): gather + rating-sort
   scale across cores.  Spawn-based workers (env-scrubbed so the axon
   sitecustomize cannot claim the TPU in a child) write prepared
   minibatches straight into double-buffered shared-memory slots; the
   parent ships each task only its permutation slice and device_puts the
   results.  Memmap-backed datasets are reopened by path in each worker
   (independent page-cache reads); in-memory datasets ship once at pool
   startup.  With a single spare core or tiny groups the pool is skipped
   automatically — prep runs on the prefetch thread as in round 4.

This module is imported by spawn workers, so it must NOT import jax (or
anything that does) at module scope.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

# ----------------------------------------------------------------------
# Epoch permutation — round 4's derivation, int32, cached per epoch
# ----------------------------------------------------------------------


def epoch_perm(seed: int, epoch: int, n_padded: int) -> np.ndarray:
    """(seed, epoch)-derived shuffle of the padded index space —
    replayable across resume; identical sequence to the round-4 trainer."""
    rng = np.random.default_rng((seed ^ 0x5EED) + 7919 * (epoch + 1))
    if n_padded < 2**31:
        return rng.permutation(np.arange(n_padded, dtype=np.int32))
    return rng.permutation(n_padded)


# ----------------------------------------------------------------------
# Per-range prep (gather + rating-sort); pure numpy
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


def _prep_minibatches(ds_arrays, layout: Dict, gperm: np.ndarray):
    """Gather + (optionally) rating-sort the minibatches covered by
    ``gperm`` (a contiguous slice of the epoch permutation, a multiple of
    ``mb`` rows).  Runs on the prefetch thread or inside a pool worker."""
    mb = layout["mb"]
    trip, rat, wts = _gather_rows(ds_arrays, layout["n"], gperm)
    g = gperm.size // mb
    arity = trip.shape[-1]
    if not layout["rsort"]:
        return (
            trip.reshape(g, mb, arity),
            rat.reshape(g, mb),
            wts.reshape(g, mb),
            None,
        )
    from trigenicinteractionpredictor_tpu.ops.pallas_em_rsorted import (
        apply_rating_sort,
        rating_sort_pad,
    )

    d_sh, ft, tile = layout["n_shards"], layout["n_tiles"], layout["tile"]
    R = layout["n_ratings"]
    mb_b = layout["mb_b"]
    trip_g = np.empty((g, mb_b, arity), np.int32)
    rat_g = np.empty((g, mb_b), np.int32)
    wts_g = np.empty((g, mb_b), np.float32)
    tiler_g = np.empty((g, d_sh * ft), np.int32)
    for m in range(g):
        sl = slice(m * mb, (m + 1) * mb)
        plan = rating_sort_pad(
            rat[sl], R, tile=tile, n_shards=d_sh, n_tiles=ft
        )
        t_, r_, w_ = apply_rating_sort(
            plan, trip[sl], rat[sl], wts[sl], n_shards=d_sh
        )
        trip_g[m], rat_g[m], wts_g[m] = t_, r_, w_
        tiler_g[m] = plan.tile_r
    return trip_g, rat_g, wts_g, tiler_g


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


def _worker_task(slot_spec, gperm: np.ndarray, m_lo: int, m_hi: int):
    """Prep the minibatch range [m_lo, m_hi) from its permutation slice
    and write it into the shared-memory slot.

    ``slot_spec``: {array_name: (shm_name, shape, dtype_str)} for the
    whole group; this task writes rows [m_lo:m_hi) of the leading axis.
    """
    out = _prep_minibatches(_W_DS, _W_LAYOUT, gperm)
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
    - in-thread: gather + sort on the calling (prefetch) thread;
    - pool: ``workers`` spawn processes write into one of two
      shared-memory slots (double-buffered for the one-group lookahead);
      the parent ships each task its permutation slice, precomputes the
      NEXT epoch's permutation while the last group's tasks run, and
      device_puts straight from the slot views (blocking on the slot's
      previous transfer before reuse).

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
        self._perm_cache: Dict = {}
        lay = self._layout
        self._n_dispatch = max(
            lay["n_padded"] // (lay["group"] * lay["mb"]), 1
        )
        if workers == 0:
            cpus = os.cpu_count() or 1
            rows_per_group = lay["group"] * lay["mb"]
            workers = (
                min(4, cpus - 1)
                if cpus >= 3 and rows_per_group >= 1 << 19
                else 1
            )
        self._workers = max(1, workers)
        if self._workers > 1:
            self._start_pool()

    # -- epoch permutation ----------------------------------------------

    def _perm(self, ep: int) -> np.ndarray:
        if self._perm_cache.get("ep") != ep:
            self._perm_cache = {
                "ep": ep,
                "perm": epoch_perm(
                    self._layout["seed"], ep, self._layout["n_padded"]
                ),
            }
        return self._perm_cache["perm"]

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
            list(self._pool.map(_noop, range(self._workers), chunksize=1))
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
        mb, g = lay["mb"], lay["group"]
        gperm = self._perm(ep)[d * g * mb : (d + 1) * g * mb]
        if self._pool is None:
            trip, rat, wts, tiler = _prep_minibatches(
                self._ds_arrays, lay, gperm
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
            per = -(-g // self._workers)
            futs = [
                self._pool.submit(
                    _worker_task, spec,
                    gperm[m * mb : min(m + per, g) * mb],
                    m, min(m + per, g),
                )
                for m in range(0, g, per)
            ]
            if d == self._n_dispatch - 1:
                # Workers are crunching the epoch's last group: take the
                # NEXT epoch's O(N) permutation off the critical path.
                self._perm(ep + 1)
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
