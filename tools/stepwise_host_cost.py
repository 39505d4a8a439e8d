"""Measure the stepwise (beyond-HBM) path's per-epoch HOST cost at scale.

VERDICT r3 weak #5: the streaming stepwise trainer re-sorts every
minibatch on the host each epoch (trainer.py _run_stepwise: per-epoch
permutation + per-group fancy-index gather + per-minibatch
rating_sort_pad/apply_rating_sort) and nothing said the host doesn't
become the bottleneck at 10^7-10^8 rows — the scale streaming exists
for.  This tool times exactly those host pieces on a synthetic memmapped
dataset (no device needed) and compares against the measured device
sweep rate, printing one JSON line per config.

Usage: python tools/stepwise_host_cost.py [--n 10000000] [--mb 131072]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Measured device rates (BASELINE.md): the bdr kernel sustains ~390-420M
# restart-triplet updates/s at S=10, i.e. ~39-42M rows/s of minibatch
# dispatch; the one-hot ensemble kernel (the non-rsort stepwise fallback)
# ~16M rows/s.
DEVICE_ROWS_PER_S_BDR = 39e6
DEVICE_ROWS_PER_S_ONEHOT = 16e6


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--genes", type=int, default=2000)
    ap.add_argument("--mb", type=int, default=131072)
    ap.add_argument("--group", type=int, default=8, help="stream_groups")
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--shards", type=int, default=1)
    ap.add_argument("--ratings", type=int, default=2)
    args = ap.parse_args()

    from trigenicinteractionpredictor_tpu.ops.pallas_em_rsorted import (
        apply_rating_sort,
        rating_sort_pad,
    )

    N, mb, group, R = args.n, args.mb, args.group, args.ratings
    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as td:
        # Synthetic packed memmap store (the beyond-HBM layout).
        trip_mm = np.memmap(
            os.path.join(td, "trip.i32"), np.int32, "w+", shape=(N, 3)
        )
        rat_mm = np.memmap(os.path.join(td, "rat.i32"), np.int32, "w+", shape=(N,))
        wts_mm = np.memmap(
            os.path.join(td, "w.f32"), np.float32, "w+", shape=(N,)
        )
        chunk = 4_000_000
        for lo in range(0, N, chunk):
            hi = min(lo + chunk, N)
            trip_mm[lo:hi] = rng.integers(
                0, args.genes, size=(hi - lo, 3), dtype=np.int32
            )
            rat_mm[lo:hi] = rng.integers(0, R, size=hi - lo, dtype=np.int32)
            wts_mm[lo:hi] = 1.0
        trip_mm.flush(); rat_mm.flush(); wts_mm.flush()

        n_padded = -(-N // mb) * mb
        n_mb = n_padded // mb
        while n_mb % group:       # mirror trainer: largest divisor <= req
            group -= 1
        n_dispatch = n_mb // group
        d_sh = args.shards
        B_sh = mb // d_sh
        ft = B_sh // args.tile + R
        mb_b = ft * args.tile * d_sh

        # --- host piece 1: the O(N) epoch permutation ------------------
        t0 = time.perf_counter()
        perm = np.random.default_rng(1).permutation(n_padded)
        t_perm = time.perf_counter() - t0

        # --- pieces 2+3 per dispatch group: gather + per-minibatch sort
        t_gather = 0.0
        t_sort = 0.0
        rows_done = 0
        for d in range(n_dispatch):
            gperm = gp = perm[d * group * mb : (d + 1) * group * mb]
            in_range = gp[gp < N]
            t0 = time.perf_counter()
            trip = np.zeros((len(gp), 3), np.int32)
            rat = np.zeros(len(gp), np.int32)
            wts = np.zeros(len(gp), np.float32)
            trip[: 0] = 0  # keep layout identical to trainer._host_rows
            mask = gp < N
            trip[mask] = trip_mm[gp[mask]]
            rat[mask] = rat_mm[gp[mask]]
            wts[mask] = wts_mm[gp[mask]]
            t_gather += time.perf_counter() - t0
            t0 = time.perf_counter()
            for m in range(group):
                sl = slice(m * mb, (m + 1) * mb)
                plan = rating_sort_pad(
                    rat[sl], R, tile=args.tile, n_shards=d_sh, n_tiles=ft
                )
                apply_rating_sort(plan, trip[sl], rat[sl], wts[sl], n_shards=d_sh)
            t_sort += time.perf_counter() - t0
            rows_done += len(gp)

        host_total = t_perm + t_gather + t_sort
        host_rows_per_s = N / host_total
        dev_bdr = N / DEVICE_ROWS_PER_S_BDR
        dev_onehot = N / DEVICE_ROWS_PER_S_ONEHOT
        print(json.dumps({
            "n": N, "mb": mb, "group": group, "tile": args.tile,
            "padded_mb_rows": mb_b,
            "t_perm_s": round(t_perm, 2),
            "t_gather_s": round(t_gather, 2),
            "t_rsort_s": round(t_sort, 2),
            "host_total_s": round(host_total, 2),
            "host_rows_per_s": round(host_rows_per_s),
            "device_epoch_s_bdr_est": round(dev_bdr, 2),
            "device_epoch_s_onehot_est": round(dev_onehot, 2),
            "host_over_device_bdr": round(host_total / dev_bdr, 2),
            "host_over_device_onehot": round(host_total / dev_onehot, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
