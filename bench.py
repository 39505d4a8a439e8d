"""Headline benchmark: EM restart-triplet updates/sec/chip at Kuzmin scale.

Run by the round driver on real TPU hardware.  Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

- Workload: the reference's own default job shape — S=10 random restarts
  over a synthetic triplet list at Kuzmin scale (N=131072 ~ 1e5 usable
  trigenic triplets, G=1000 genes, K=10, R=2 — SURVEY.md §1.3, §4.1
  ``-s 10``), resident in HBM; one full fused ensemble EM sweep per step
  (E + M + normalize + likelihood for all 10 restarts), via the SAME
  production path ``fit()`` uses (sharded step + auto-dispatched kernel).
- Unit: one "triplet" = one (triplet, restart) EM update — the same unit
  of work the pure-Python reference performs once per inner-loop pass of
  its serial ``for sample in range(S)`` driver, so the ratio is
  apples-to-apples.
- vs_baseline: measured against the reference-shaped pure-Python EM
  (baselines/python_reference.py) on this host — the reference publishes no
  numbers (BASELINE.md), so the stand-in is measured fresh each run and the
  ratio is the "greater than or equal to 100x single-chip" target of
  BASELINE.json:5.

Extra context (single-restart throughput, sweep wall time, baseline
throughput, backend) goes to stderr so stdout stays a single JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "baselines"))

N = 131072
G = 1000
K = 10
R = 2
S = 10       # restarts — the reference CLI's default ``-s 10`` (SURVEY.md §4.1)
SWEEPS = 120


def parse_args(argv=None) -> argparse.Namespace:
    """Workload knobs (defaults = the headline shape recorded in BASELINE.md).

    Non-default shapes are experiments: the JSON line marks them with the
    chosen shape so a driver-recorded BENCH file is never silently
    off-workload.
    """
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-n", type=int, default=N, help="triplets")
    ap.add_argument("-g", "--genes", type=int, default=G)
    ap.add_argument("-k", type=int, default=K)
    ap.add_argument("-s", "--samples", type=int, default=S)
    ap.add_argument("--sweeps", type=int, default=SWEEPS)
    ap.add_argument("--backend", default="auto", choices=["auto", "jnp", "pallas"])
    ap.add_argument(
        "--warm-only", action="store_true",
        help="compile every step (seeding the persistent cache) and exit "
        "without timing — lets callers split compile latency from the "
        "throughput measurement (the axon relay's first compile varies "
        "1.5-516s with load, which is not a perf regression)",
    )
    ap.add_argument(
        "--serve", action="store_true",
        help="measure the SERVING path instead: device-resident ensemble "
        "scoring rows/s through the fused scoring kernel "
        "(ops/pallas_score.py); prints its own JSON metric line",
    )
    return ap.parse_args(argv)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def measure_engine(args) -> float:
    N, G, K, S, SWEEPS = args.n, args.genes, args.k, args.samples, args.sweeps
    import jax
    import jax.numpy as jnp

    # Persistent compile cache: first-compile latency through the axon
    # remote-compile relay is wildly variable (1.5 s to 516 s observed).
    # The cache lives OUTSIDE the repo by default (override with
    # TIP_JAX_CACHE_DIR) so fresh checkouts / CI workspaces on the same
    # host reuse it instead of paying every cold compile again.
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
    from trigenicinteractionpredictor_tpu.ops.dispatch import resolve_stats_fn
    from trigenicinteractionpredictor_tpu.ops.em import Batch
    from trigenicinteractionpredictor_tpu.parallel.mesh import single_device_mesh
    from trigenicinteractionpredictor_tpu.parallel.sharded_em import (
        make_sharded_multi_step,
        replicate,
        shard_batch,
        shard_ensemble,
    )

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})")
    ds, _, _ = sample_synthetic_dataset(N, G, K, n_ratings=R, seed=0)
    mesh = single_device_mesh()
    raw_batch = Batch(
        triplets=jnp.asarray(ds.triplets),
        ratings=jnp.asarray(ds.ratings),
        weights=jnp.asarray(ds.weights),
    )
    degrees = replicate(mesh, jnp.asarray(ds.degrees()))

    # The production step fit() runs: ensemble-stacked states, psum'd stats,
    # likelihood_freq (=10) sweeps scanned device-side per dispatch.
    chunk = 10

    def run(n_samples: int, reps: int = 3) -> float:
        stats_fn = resolve_stats_fn(
            args.backend, G, K, n_samples=n_samples, n_rows=N
        )
        log(f"S={n_samples} backend: {'pallas kernel' if stats_fn else 'jnp/XLA'}")
        bench_batch = raw_batch
        if getattr(stats_fn, "needs_rsort", False):
            # bdr path: per-shard rating sort + per-class tile padding,
            # same as the trainer (train/trainer.py).  The tile table
            # rides through shard_batch like the other plan fields.
            from trigenicinteractionpredictor_tpu.ops.pallas_em_rsorted import (
                apply_rating_sort,
                rating_sort_pad,
            )

            rplan = rating_sort_pad(
                np.asarray(ds.ratings), R, tile=stats_fn.tile_b,
                n_shards=mesh.shape["data"],
            )
            t_, r_, w_ = apply_rating_sort(
                rplan, np.asarray(ds.triplets), np.asarray(ds.ratings),
                np.asarray(ds.weights), n_shards=mesh.shape["data"],
            )
            bench_batch = Batch(
                triplets=jnp.asarray(t_),
                ratings=jnp.asarray(r_),
                weights=jnp.asarray(w_),
                tile_rating=jnp.asarray(rplan.tile_r),
            )
            log(
                f"S={n_samples} bdr rating-sort: tile={stats_fn.tile_b} "
                f"rows={rplan.n_rows * mesh.shape['data']}"
            )
        elif getattr(stats_fn, "needs_g1plan", False):
            # bdg path: g1-block row order + 2-position scatter plan, same
            # as the trainer (train/trainer.py).
            from trigenicinteractionpredictor_tpu.ops.pallas_em_bdg import (
                apply_g1_order,
                make_g1_plan,
            )
            from trigenicinteractionpredictor_tpu.ops.pallas_em_large import (
                make_scatter_plan,
            )

            g1plan = make_g1_plan(
                np.asarray(ds.triplets), G, wb1=stats_fn.wb1,
                tile=stats_fn.tile_b, n_shards=mesh.shape["data"],
            )
            t_, r_, w_ = apply_g1_order(
                g1plan, np.asarray(ds.triplets), np.asarray(ds.ratings),
                np.asarray(ds.weights), n_shards=mesh.shape["data"],
            )
            splan = make_scatter_plan(
                t_, G, n_shards=mesh.shape["data"],
                wb=stats_fn.wb, tile=stats_fn.tile_b, positions=(1, 2),
            )
            bench_batch = Batch(
                triplets=jnp.asarray(t_),
                ratings=jnp.asarray(r_),
                weights=jnp.asarray(w_),
                scatter_perm=jnp.asarray(splan.perm),
                scatter_lid=jnp.asarray(splan.lid),
                scatter_block=jnp.asarray(splan.block),
                g1_lid=jnp.asarray(g1plan.lid1),
                g1_block=jnp.asarray(g1plan.blk1),
            )
            log(
                f"S={n_samples} large-G plan (g1-fused): wb1={stats_fn.wb1} "
                f"tile={stats_fn.tile_b} rows={g1plan.n_rows * mesh.shape['data']}"
            )
        elif getattr(stats_fn, "needs_plan", False):
            # Large-G path: attach the host-built sorted-block scatter plan,
            # same as the trainer (train/trainer.py).  N is tile-aligned
            # here, so the plan maps the batch rows 1:1.  The plan fields
            # ride through shard_batch BELOW (mirroring the trainer's
            # attach-then-shard order), so on a multi-device mesh they would
            # pick up the per-shard layout the kernel expects.
            from trigenicinteractionpredictor_tpu.ops.pallas_em_large import (
                make_scatter_plan,
            )

            plan = make_scatter_plan(
                np.asarray(ds.triplets), G, n_shards=mesh.shape["data"],
                wb=stats_fn.wb, tile=stats_fn.tile_b,
            )
            bench_batch = raw_batch._replace(
                scatter_perm=jnp.asarray(plan.perm),
                scatter_lid=jnp.asarray(plan.lid),
                scatter_block=jnp.asarray(plan.block),
            )
            log(f"S={n_samples} large-G plan: wb={stats_fn.wb} tile={stats_fn.tile_b}")
        bench_batch = shard_batch(mesh, bench_batch)
        step_kwargs = {} if stats_fn is None else {"stats_fn": stats_fn}
        step = make_sharded_multi_step(mesh, chunk, **step_kwargs)
        keys = jax.random.split(jax.random.key(0), n_samples)
        states0 = shard_ensemble(
            mesh, jax.vmap(lambda k: init_state(k, G, K, R))(keys)
        )
        t0 = time.perf_counter()
        states, ll_hist = step(states0, bench_batch, degrees)
        _ = float(ll_hist[-1, 0])
        log(f"S={n_samples} first step (compile+run): {time.perf_counter() - t0:.1f}s")
        if args.warm_only:
            return 0.0

        # Timed: SWEEPS chained ensemble EM sweeps, best of ``reps`` (the
        # axon relay tunnel adds load-dependent jitter run-to-run).  The
        # final scalar fetch is the sync point — block_until_ready alone has
        # been observed not to wait on this backend.
        best_dt, ll_best = float("inf"), 0.0
        for _ in range(reps):
            states = states0
            t0 = time.perf_counter()
            for _ in range(SWEEPS // chunk):
                states, ll_hist = step(states, bench_batch, degrees)
            ll_best = float(jnp.max(ll_hist[-1]))
            best_dt = min(best_dt, time.perf_counter() - t0)
        tps = SWEEPS * N * n_samples / best_dt
        log(
            f"engine: {SWEEPS} sweeps x {N} triplets x {n_samples} restarts"
            f" in {best_dt:.3f}s (best of {reps})"
            f" -> {tps:,.0f} restart-triplet updates/s/chip (best L={ll_best:,.0f})"
        )
        return tps

    run(1)        # single-restart datapoint for BASELINE.md (stderr)
    return run(S)  # headline: the reference's own default job shape


def measure_baseline(args) -> float:
    from python_reference import measure_triplets_per_sec

    # Best of 3: host load varies 3-4x run to run, and an understated
    # baseline would overstate vs_baseline.
    tps = max(
        measure_triplets_per_sec(
            n_triplets=200, n_genes=args.genes, k=args.k, n_ratings=R,
            min_seconds=1.5,
        )
        for _ in range(3)
    )
    log(f"pure-Python reference-shaped EM: {tps:,.0f} triplets/s (1 CPU core, best of 3)")
    return tps


def measure_serving(args) -> None:
    """Device-resident ensemble-scoring rows/s via the fused kernel
    (ops/pallas_score.py) — the serving hot path; BASELINE.md round 5."""
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
    from trigenicinteractionpredictor_tpu.ops.pallas_score import (
        _fit_score_tile,
        pallas_ensemble_predict_interaction,
    )
    from trigenicinteractionpredictor_tpu.ops.scoring import (
        ensemble_predict_interaction,
    )

    n, g, k, s = args.n, args.genes, args.k, args.samples
    ds, _, _ = sample_synthetic_dataset(n, g, k, n_ratings=R, seed=0)
    keys = jax.random.split(jax.random.key(0), s)
    states = jax.vmap(lambda kk: init_state(kk, g, k, R))(keys)
    trips = jnp.asarray(ds.triplets)
    serve_tile = _fit_score_tile(g, k, s)
    on_kernel = serve_tile is not None and jax.default_backend() == "tpu"
    if on_kernel:
        fn = jax.jit(
            lambda st, tr: pallas_ensemble_predict_interaction(
                st, tr, tile_b=serve_tile, interpret=False
            )
        )
    else:  # CPU / oversize fallback — still a valid serving measurement
        fn = jax.jit(lambda st, tr: ensemble_predict_interaction(st, tr))
    log(f"serving scorer: {'pallas kernel' if on_kernel else 'jnp'}")
    out = fn(states, trips)
    jax.block_until_ready(out)
    if args.warm_only:
        print(json.dumps({"metric": "warm_only", "value": 1, "unit": "cache"}))
        return
    best = float("inf")
    reps, inner = 3, 20
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(states, trips)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / inner)
    rows = n / best
    log(f"serving: {n} rows x {s} restarts in {best*1e3:.2f} ms "
        f"-> {rows:,.0f} rows/s/chip (device-resident)")
    print(
        json.dumps(
            {
                "metric": "ensemble_serving_rows_per_sec_per_chip",
                "value": round(rows, 1),
                "unit": "rows/s",
                "vs_baseline": 0.0,
                "shape": {"n": n, "g": g, "k": k, "s": s},
            }
        )
    )


def main() -> None:
    args = parse_args()
    if args.serve:
        measure_serving(args)
        return
    engine_tps = measure_engine(args)
    if args.warm_only:
        print(json.dumps({"metric": "warm_only", "value": 1, "unit": "cache"}))
        return
    baseline_tps = measure_baseline(args)
    result = {
        "metric": "em_restart_triplet_updates_per_sec_per_chip",
        "value": round(engine_tps, 1),
        "unit": "triplets/s",
        "vs_baseline": round(engine_tps / baseline_tps, 1),
    }
    if (args.n, args.genes, args.k, args.samples) != (N, G, K, S):
        result["shape"] = {
            "n": args.n, "g": args.genes, "k": args.k, "s": args.samples,
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
