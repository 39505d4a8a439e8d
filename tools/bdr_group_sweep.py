"""Measure the bdr kernel's restart sub-group frontier on the real chip.

The bdr kernel's block-diagonal stages overcompute quadratically in the
group width g (12*g*K^3 FLOPs/update for the six gK2-wide stages), while
the invocation count per tile grows as S/g.  ``group`` trades one against
the other (group=S: one matmul/stage, today's default; group=1: the old
per-restart loop).  This tool times the SAME production chained step
bench.py uses at each group value and prints a table, so dispatch can pin
the measured-best default (DESIGN.md §2b; VERDICT r2 item 1 follow-on).

Usage (TPU host):
    python tools/bdr_group_sweep.py                 # headline shape
    python tools/bdr_group_sweep.py --groups 10 5 2 --k 16 --sweeps 60

One JSON line per measurement to stdout; human table to stderr.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-n", type=int, default=131072)
    ap.add_argument("-g", "--genes", type=int, default=1000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--s", type=int, default=10)
    ap.add_argument("--groups", type=int, nargs="+", default=[10, 5, 2, 1])
    ap.add_argument("--sweeps", type=int, default=120)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tile", type=int, default=0, help="0 = dispatch's pick")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "TIP_JAX_CACHE_DIR", os.path.expanduser("~/.cache/trigenic_tpu_jax")
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from trigenicinteractionpredictor_tpu.data.synthetic import (
        sample_synthetic_dataset,
    )
    from trigenicinteractionpredictor_tpu.models.mmsbm import init_state
    from trigenicinteractionpredictor_tpu.ops.dispatch import _fit_bdr_tile
    from trigenicinteractionpredictor_tpu.ops.em import Batch
    from trigenicinteractionpredictor_tpu.ops.pallas_em_bdr import (
        bdr_em_ensemble_stats,
    )
    from trigenicinteractionpredictor_tpu.ops.pallas_em_rsorted import (
        apply_rating_sort,
        rating_sort_pad,
    )
    from trigenicinteractionpredictor_tpu.parallel.mesh import (
        single_device_mesh,
    )
    from trigenicinteractionpredictor_tpu.parallel.sharded_em import (
        make_sharded_multi_step,
        replicate,
        shard_batch,
        shard_ensemble,
    )

    N, G, K, S, R = args.n, args.genes, args.k, args.s, 2
    SWEEPS, chunk = args.sweeps, 10
    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})")
    ds, _, _ = sample_synthetic_dataset(N, G, K, n_ratings=R, seed=0)
    mesh = single_device_mesh()
    degrees = replicate(mesh, jnp.asarray(ds.degrees()))

    if args.tile:
        tile = args.tile
    else:
        fit = _fit_bdr_tile(G, K, 512, S)
        if fit is None:
            log(f"no bdr tile fits G={G} K={K} S={S}; aborting")
            sys.exit(2)
        tile = fit[0]
    rplan = rating_sort_pad(
        np.asarray(ds.ratings), R, tile=tile, n_shards=mesh.shape["data"]
    )
    t_, r_, w_ = apply_rating_sort(
        rplan,
        np.asarray(ds.triplets),
        np.asarray(ds.ratings),
        np.asarray(ds.weights),
        n_shards=mesh.shape["data"],
    )
    batch = shard_batch(
        mesh,
        Batch(
            triplets=jnp.asarray(t_),
            ratings=jnp.asarray(r_),
            weights=jnp.asarray(w_),
            tile_rating=jnp.asarray(rplan.tile_r),
        ),
    )
    keys = jax.random.split(jax.random.key(0), S)
    states0 = shard_ensemble(
        mesh, jax.vmap(lambda kk: init_state(kk, G, K, R))(keys)
    )
    n_rows = rplan.n_rows * mesh.shape["data"]

    rows = []
    for grp in args.groups:
        if S % grp:
            log(f"group={grp}: skip (does not divide S={S})")
            continue
        stats_fn = functools.partial(
            bdr_em_ensemble_stats, tile_b=tile, group=grp
        )
        stats_fn.ensemble = True
        step = make_sharded_multi_step(mesh, chunk, stats_fn=stats_fn)
        t0 = time.perf_counter()
        st, ll_hist = step(states0, batch, degrees)
        _ = float(ll_hist[-1, 0])
        log(f"group={grp}: compile+first {time.perf_counter() - t0:.1f}s")
        best_dt, ll_last = float("inf"), 0.0
        for _ in range(args.reps):
            st = states0
            t0 = time.perf_counter()
            for _ in range(SWEEPS // chunk):
                st, ll_hist = step(st, batch, degrees)
            ll_last = float(jnp.max(ll_hist[-1]))
            best_dt = min(best_dt, time.perf_counter() - t0)
        upd_s = N * S * SWEEPS / best_dt
        ms_sweep = best_dt / SWEEPS * 1e3
        rec = {
            "path": "bdr",
            "group": grp,
            "tile": tile,
            "G": G,
            "K": K,
            "S": S,
            "n_rows": int(n_rows),
            "ms_per_sweep": round(ms_sweep, 3),
            "updates_per_s": round(upd_s),
            "final_ll": ll_last,
        }
        rows.append(rec)
        print(json.dumps(rec), flush=True)
        log(
            f"group={grp}: {ms_sweep:.2f} ms/sweep, {upd_s / 1e6:.1f}M upd/s, "
            f"L={ll_last:.1f}"
        )

    if rows:
        log("\ngroup  ms/sweep  Mupd/s")
        for r in rows:
            log(
                f"{r['group']:>5}  {r['ms_per_sweep']:>8.2f}  "
                f"{r['updates_per_s'] / 1e6:>7.1f}"
            )


if __name__ == "__main__":
    main()
