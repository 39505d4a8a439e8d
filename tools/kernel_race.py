"""Race the one-hot ensemble kernel vs the pre-gathered/sorted-scatter
large-G kernel across G (and wb), on the real chip (VERDICT r2 item 1).

Round-2 left dispatch treating ops/pallas_em_large.py strictly as the
fallback for G past the one-hot kernel's VMEM ceiling, but the two were
never raced in the regime where both run: the one-hot kernel spends
O(G) gather/scatter FLOPs per row (~6*G*S*K, ~98% of its MXU work at the
G=1000 headline), while the plan path spends O(wb) on the scatter plus a
memory-bound XLA gather.  This tool measures both through the SAME
production sharded step bench.py uses and prints a path x shape table, so
ops/dispatch.py can pick by measured speed instead of by feasibility.

Usage (on the TPU host):
    python tools/kernel_race.py                    # default grid
    python tools/kernel_race.py --g 1000 4000 --s 10 --wb 128 512

Writes one JSON line per measurement to stdout; human table to stderr.
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

N = 131072
K = 10
R = 2
SWEEPS = 60
CHUNK = 10


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--g", type=int, nargs="+", default=[1000, 2000, 4000, 16000, 100000])
    ap.add_argument("--s", type=int, nargs="+", default=[10, 1])
    ap.add_argument("--wb", type=int, nargs="+", default=[512, 128])
    ap.add_argument("--k", type=int, default=K)
    ap.add_argument("-n", type=int, default=N)
    ap.add_argument("--sweeps", type=int, default=SWEEPS)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--tile", type=int, nargs="+", default=[512],
        help="E-step/scatter tile sizes to try on the plan path "
        "(latency-share probe: bigger tiles amortize per-matmul latency)",
    )
    ap.add_argument(
        "--paths", nargs="+", default=["onehot", "hybrid", "plan"],
        help="which kernel paths to race",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "TIP_JAX_CACHE_DIR",
            os.path.expanduser("~/.cache/trigenic_tpu_jax"),
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from trigenicinteractionpredictor_tpu.data.synthetic import (
        sample_synthetic_dataset,
    )
    from trigenicinteractionpredictor_tpu.models.mmsbm import init_state
    from trigenicinteractionpredictor_tpu.ops.dispatch import (
        _fit_large_tile,
        _fit_tile,
        _pallas_fn,
        _pallas_grouped_fn,
        _pick_group,
        _MAX_ENSEMBLE_GROUP,
    )
    from trigenicinteractionpredictor_tpu.ops.em import Batch
    from trigenicinteractionpredictor_tpu.ops.pallas_em_large import (
        large_g_ensemble_stats,
        make_scatter_plan,
    )
    from trigenicinteractionpredictor_tpu.parallel.mesh import single_device_mesh
    from trigenicinteractionpredictor_tpu.parallel.sharded_em import (
        make_sharded_multi_step,
        replicate,
        shard_batch,
        shard_ensemble,
    )

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})")
    mesh = single_device_mesh()
    k = args.k

    def measure(stats_fn, raw_batch, ds, n_samples):
        step = make_sharded_multi_step(mesh, CHUNK, stats_fn=stats_fn)
        batch = raw_batch
        if getattr(stats_fn, "needs_plan", False):
            plan = make_scatter_plan(
                np.asarray(ds.triplets), ds.n_genes, n_shards=1,
                wb=stats_fn.wb, tile=stats_fn.tile_b,
            )
            batch = raw_batch._replace(
                scatter_perm=jnp.asarray(plan.perm),
                scatter_lid=jnp.asarray(plan.lid),
                scatter_block=jnp.asarray(plan.block),
            )
        batch = shard_batch(mesh, batch)
        degrees = replicate(mesh, jnp.asarray(ds.degrees()))
        keys = jax.random.split(jax.random.key(0), n_samples)
        states0 = shard_ensemble(
            mesh, jax.vmap(lambda kk: init_state(kk, ds.n_genes, k, R))(keys)
        )
        t0 = time.perf_counter()
        states, ll = step(states0, batch, degrees)
        _ = float(ll[-1, 0])
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(args.reps):
            states = states0
            t0 = time.perf_counter()
            for _ in range(args.sweeps // CHUNK):
                states, ll = step(states, batch, degrees)
            _ = float(jnp.max(ll[-1]))
            best = min(best, time.perf_counter() - t0)
        return args.sweeps * args.n * n_samples / best, compile_s

    for S in args.s:
        for G in args.g:
            ds, _, _ = sample_synthetic_dataset(args.n, G, k, n_ratings=R, seed=0)
            raw = Batch(
                triplets=jnp.asarray(ds.triplets),
                ratings=jnp.asarray(ds.ratings),
                weights=jnp.asarray(ds.weights),
            )
            rows = []

            # Path A: one-hot ensemble kernel (grouped past the lane cap).
            if "onehot" in args.paths:
                if S <= _MAX_ENSEMBLE_GROUP:
                    tile = _fit_tile(G, k, 512, S)
                    fn = _pallas_fn(tile) if tile is not None else None
                else:
                    grp = _pick_group(G, k, 512, S)
                    fn = (
                        _pallas_grouped_fn(_fit_tile(G, k, 512, grp), grp)
                        if grp is not None
                        else None
                    )
                if fn is not None:
                    tps, cs = measure(fn, raw, ds, S)
                    rows.append(("onehot", None, tps, cs))
                else:
                    rows.append(("onehot", None, 0.0, 0.0))
                    log(f"G={G} S={S}: one-hot kernel does not fit")

            # Path H: XLA gather + in-kernel one-hot scatter (hybrid).
            if "hybrid" in args.paths:
                from trigenicinteractionpredictor_tpu.ops.dispatch import (
                    _fit_hybrid_tile,
                    _pallas_hybrid_fn,
                )

                tile_h = _fit_hybrid_tile(G, k, 512, S)
                if tile_h is not None:
                    fn = _pallas_hybrid_fn(tile_h)
                    tps, cs = measure(fn, raw, ds, S)
                    rows.append(("hybrid", None, tps, cs))
                else:
                    log(f"G={G} S={S}: hybrid kernel does not fit")

            # Path D: block-diagonal ensemble algebra + plan scatter.
            if "bd" in args.paths:
                from trigenicinteractionpredictor_tpu.ops.pallas_em_bd import (
                    bd_em_ensemble_stats,
                )

                for wb in args.wb:
                    for tile_bd in args.tile:
                        n_blocks = -(-G // wb)
                        fn = functools.partial(
                            bd_em_ensemble_stats, tile_b=tile_bd, wb=wb,
                            n_blocks=n_blocks,
                        )
                        fn.ensemble = True
                        fn.tile_b = tile_bd
                        fn.wb = wb
                        fn.needs_plan = True
                        try:
                            tps, cs = measure(fn, raw, ds, S)
                        except Exception as e:
                            log(
                                f"G={G} S={S} bd wb={wb} tile={tile_bd}: "
                                f"{type(e).__name__}: {str(e)[:200]}"
                            )
                            continue
                        rows.append((f"bd_t{tile_bd}", wb, tps, cs))

            # Path B: pre-gathered + sorted-block scatter, per wb x tile.
            if "plan" in args.paths:
                for wb in args.wb:
                    for tile_lg in args.tile:
                        n_blocks = -(-G // wb)
                        fn = functools.partial(
                            large_g_ensemble_stats, tile_b=tile_lg, wb=wb,
                            n_blocks=n_blocks,
                        )
                        fn.ensemble = True
                        fn.tile_b = tile_lg
                        fn.wb = wb
                        fn.needs_plan = True
                        try:
                            tps, cs = measure(fn, raw, ds, S)
                        except Exception as e:  # VMEM OOM probes survive
                            log(
                                f"G={G} S={S} wb={wb} tile={tile_lg}: "
                                f"{type(e).__name__}: {str(e)[:200]}"
                            )
                            continue
                        rows.append((f"plan_t{tile_lg}", wb, tps, cs))

            for path, wb, tps, cs in rows:
                rec = {
                    "path": path, "wb": wb, "g": G, "s": S, "k": k,
                    "n": args.n, "updates_per_sec": round(tps, 1),
                    "compile_s": round(cs, 1),
                }
                print(json.dumps(rec), flush=True)
                log(
                    f"G={G:>7} S={S:>3} {path:>6}"
                    + (f"(wb={wb})" if wb else "      ")
                    + f": {tps/1e6:8.1f}M updates/s (compile {cs:.1f}s)"
                )


if __name__ == "__main__":
    main()
