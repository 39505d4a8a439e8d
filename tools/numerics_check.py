"""On-chip EM monotonicity check: fast vs strict kernel numerics.

EM guarantees a non-decreasing likelihood (SURVEY.md §1.2 calls the
monotone-L trace "the single most valuable correctness invariant").  On
the MXU's DEFAULT precision (bf16 operand passes) round-3 traces showed
drops of up to -41 nats at |L| ~ 9e4; EngineConfig.precision='strict'
(VERDICT r3 item 4) buys the invariant back with HIGHEST on every kernel
matmul.  This script measures both modes' violation envelope and
throughput on the production chained step and prints one JSON line per
mode — tests/test_tpu_numerics.py asserts on its output, and the numbers
feed the BASELINE.md numerics section.

Usage (TPU host): python tools/numerics_check.py [--sweeps 60]
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


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-n", type=int, default=131072)
    ap.add_argument("-g", "--genes", type=int, default=1000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--s", type=int, default=10)
    ap.add_argument("--sweeps", type=int, default=60)
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
    from trigenicinteractionpredictor_tpu.ops.dispatch import resolve_stats_fn
    from trigenicinteractionpredictor_tpu.ops.em import Batch
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

    N, G, K, S = args.n, args.genes, args.k, args.s
    R = 2
    ds, _, _ = sample_synthetic_dataset(N, G, K, n_ratings=R, seed=0)
    mesh = single_device_mesh()
    degrees = replicate(mesh, jnp.asarray(ds.degrees()))
    keys = jax.random.split(jax.random.key(0), S)
    states0 = shard_ensemble(
        mesh, jax.vmap(lambda kk: init_state(kk, G, K, R))(keys)
    )

    for mode in ("fast", "strict"):
        fn = resolve_stats_fn(
            "auto", G, K, 512, n_samples=S, precision=mode
        )
        kern = getattr(fn, "kernel_name", "jnp")
        needs_rsort = getattr(fn, "needs_rsort", False)
        tile = getattr(fn, "tile_b", 512)
        if needs_rsort:
            rplan = rating_sort_pad(
                np.asarray(ds.ratings), R, tile=tile,
                n_shards=mesh.shape["data"],
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
        else:
            pad_n = -(-N // max(tile, 512)) * max(tile, 512)
            dsp = ds.pad_to(pad_n)
            batch = shard_batch(
                mesh,
                Batch(
                    triplets=jnp.asarray(dsp.triplets),
                    ratings=jnp.asarray(dsp.ratings),
                    weights=jnp.asarray(dsp.weights),
                ),
            )
        kw = {} if fn is None else {"stats_fn": fn}
        # chunk=1: the trace must contain EVERY sweep's pre-update L.
        step = make_sharded_multi_step(mesh, 1, **kw)
        st = states0
        ll_rows = []
        t0 = time.perf_counter()
        for _ in range(args.sweeps):
            st, ll_hist = step(st, batch, degrees)
            ll_rows.append(np.asarray(ll_hist[-1], dtype=np.float64))
        wall_first = time.perf_counter() - t0
        # timing pass (warm)
        st = states0
        t0 = time.perf_counter()
        for _ in range(args.sweeps):
            st, ll_hist = step(st, batch, degrees)
        _ = np.asarray(ll_hist[-1])
        wall = time.perf_counter() - t0
        trace = np.stack(ll_rows)  # [sweeps, S] pre-update L per restart
        deltas = np.diff(trace, axis=0)
        worst = float(deltas.min()) if deltas.size else 0.0
        rec = {
            "mode": mode,
            "kernel": kern,
            "tile": tile,
            "n": N,
            "K": K,
            "S": S,
            "sweeps": args.sweeps,
            "worst_delta_nats": worst,
            "n_violations": int((deltas < 0).sum()),
            "abs_L": float(np.abs(trace[-1]).max()),
            "ms_per_sweep": round(wall / args.sweeps * 1e3, 3),
            "upd_per_s": round(N * S * args.sweeps / wall),
            "compile_wall_s": round(wall_first, 1),
        }
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
