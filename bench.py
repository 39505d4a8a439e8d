"""Headline benchmark: EM triplets/sec/chip at Kuzmin scale (K=10).

Run by the round driver on real TPU hardware.  Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

- Workload: synthetic triplet list at Kuzmin scale (N=131072 ~ 1e5 usable
  trigenic triplets, G=1000 genes, K=10, R=2 — SURVEY.md §1.3) resident in
  HBM; one full fused EM sweep per step (E + M + normalize + likelihood).
- vs_baseline: measured against the reference-shaped pure-Python EM
  (baselines/python_reference.py) on this host — the reference publishes no
  numbers (BASELINE.md), so the stand-in is measured fresh each run and the
  ratio is the "greater than or equal to 100x single-chip" target of
  BASELINE.json:5.

Extra context (sweep wall time, baseline throughput, backend) goes to
stderr so stdout stays a single JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "baselines"))

N = 131072
G = 1000
K = 10
R = 2
SWEEPS = 120


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def measure_engine() -> float:
    import jax
    import jax.numpy as jnp

    # Persistent compile cache: first-compile latency through the axon
    # remote-compile relay is wildly variable (1.5 s to 516 s observed).
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from trigenicinteractionpredictor_tpu.data.synthetic import (
        sample_synthetic_dataset,
    )
    from trigenicinteractionpredictor_tpu.models.mmsbm import init_state
    from trigenicinteractionpredictor_tpu.ops.dispatch import resolve_stats_fn
    from trigenicinteractionpredictor_tpu.ops.em import (
        Batch,
        em_step,
        normalize_from_stats,
    )

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})")
    ds, _, _ = sample_synthetic_dataset(N, G, K, n_ratings=R, seed=0)
    batch = Batch(
        triplets=jax.device_put(jnp.asarray(ds.triplets)),
        ratings=jax.device_put(jnp.asarray(ds.ratings)),
        weights=jax.device_put(jnp.asarray(ds.weights)),
    )
    degrees = jnp.asarray(ds.degrees())
    state = init_state(jax.random.key(0), G, K, R)

    stats_fn = resolve_stats_fn("auto", G, K)
    log(f"backend: {'pallas kernel' if stats_fn else 'jnp/XLA'}")
    if stats_fn is None:
        step_fn = em_step
    else:
        def step_fn(s, b, d):
            stats = stats_fn(s.theta, s.p, b)
            return normalize_from_stats(s, stats, d), stats.loglik

    # No donation: the axon backend deadlocks on donated executables.
    step = jax.jit(step_fn)

    t0 = time.perf_counter()
    state, ll = step(state, batch, degrees)
    _ = float(ll)
    log(f"first step (compile+run): {time.perf_counter() - t0:.1f}s")

    # Timed: SWEEPS chained EM sweeps.  The final scalar fetch is the sync
    # point — block_until_ready alone has been observed not to wait on this
    # backend.
    t0 = time.perf_counter()
    for _ in range(SWEEPS):
        state, ll = step(state, batch, degrees)
    ll_final = float(ll)
    dt = time.perf_counter() - t0
    tps = SWEEPS * N / dt
    ll = ll_final
    log(
        f"engine: {SWEEPS} sweeps x {N} triplets in {dt:.3f}s"
        f" -> {tps:,.0f} triplets/s/chip (L={ll:,.0f})"
    )
    return tps


def measure_baseline() -> float:
    from python_reference import measure_triplets_per_sec

    tps = measure_triplets_per_sec(
        n_triplets=200, n_genes=G, k=K, n_ratings=R, min_seconds=2.0
    )
    log(f"pure-Python reference-shaped EM: {tps:,.0f} triplets/s (1 CPU core)")
    return tps


def main() -> None:
    engine_tps = measure_engine()
    baseline_tps = measure_baseline()
    result = {
        "metric": "em_triplets_per_sec_per_chip",
        "value": round(engine_tps, 1),
        "unit": "triplets/s",
        "vs_baseline": round(engine_tps / baseline_tps, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
