"""Time-to-converged-held-out-AUC — the second half of the north-star
metric (BASELINE.json:2: "EM triplets/sec/chip + time-to-converged held-out
AUC on the trigenic test set"; VERDICT r2 item 5).

bench.py measures raw sweep throughput; this harness measures how fast the
production path turns that throughput into QUALITY: post-compile wall
seconds of training until the ensemble held-out AUC is within ``tol`` of
its converged value.  A kernel that got faster per sweep but (say) broke
the restart lane-stacking or the normalize tail would pass the throughput
gate and fail this one.

Workload: synthetic Kuzmin-scale ground truth (N=131072, G=1000, K=10,
S=10 restarts — the reference's default job shape, same as bench.py) with
an 80/20 held-out split; training runs through the SAME production sharded
step ``fit()`` uses.  Timing covers dispatch + device compute + the
likelihood sync; the per-check AUC evaluation runs OUTSIDE the timer (the
reference evaluates in a separate pass too — SURVEY.md §4.4).

Prints ONE JSON line:
    {"metric": "seconds_to_converged_auc", "value": t, "unit": "s", ...}
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

N = 131072
G = 1000
K = 10
R = 2
S = 10
FREQ = 10          # sweeps per check — the trainer's likelihood_freq default
MAX_SWEEPS = 300
TOL = 0.005


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def parse_args(argv=None) -> argparse.Namespace:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-n", type=int, default=N)
    ap.add_argument("-g", "--genes", type=int, default=G)
    ap.add_argument("-k", type=int, default=K)
    ap.add_argument("-s", "--samples", type=int, default=S)
    ap.add_argument("--max-sweeps", type=int, default=MAX_SWEEPS)
    ap.add_argument("--freq", type=int, default=FREQ)
    ap.add_argument("--tol", type=float, default=TOL)
    ap.add_argument("--backend", default="auto")
    ap.add_argument(
        "--seed", type=int, default=0,
        help="restart-init seed (data stays seed=0, so seed sweeps measure "
        "EM plateau noise on a FIXED dataset — BASELINE.md wide-S study)",
    )
    ap.add_argument(
        "--alpha", type=float, default=0.2,
        help="generator Dirichlet concentration.  NOTE: every alpha/G "
        "combination at the N=131k production shape sits at or past the "
        "MMSBM detection threshold (measured 2026-08-20: Bayes 0.55-0.62, "
        "EM plateau 0.50-0.53 for alpha in {0.2, 0.5}, G in {200, 300, "
        "1000} — consistent with the BASELINE.md landscape study), so "
        "auc_final is a parity-tracking number, not a Bayes-recovery "
        "target; the metric gates (a) seconds to reach the plateau and "
        "(b) the plateau value itself.",
    )
    return ap.parse_args(argv)


def main() -> None:
    args = parse_args()
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

    from trigenicinteractionpredictor_tpu.data.splits import train_test_split
    from trigenicinteractionpredictor_tpu.data.synthetic import (
        sample_synthetic_dataset,
    )
    from trigenicinteractionpredictor_tpu.eval import evaluate
    from trigenicinteractionpredictor_tpu.models.mmsbm import ModelState, init_state
    from trigenicinteractionpredictor_tpu.ops.dispatch import resolve_stats_fn
    from trigenicinteractionpredictor_tpu.ops.em import Batch
    from trigenicinteractionpredictor_tpu.ops.metrics import auc
    from trigenicinteractionpredictor_tpu.ops.scoring import (
        ensemble_predict_interaction,
    )
    from trigenicinteractionpredictor_tpu.parallel.mesh import single_device_mesh
    from trigenicinteractionpredictor_tpu.parallel.sharded_em import (
        make_sharded_multi_step,
        replicate,
        shard_batch,
        shard_ensemble,
    )

    n, g, k, s = args.n, args.genes, args.k, args.samples
    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})")
    ds, theta_star, p_star = sample_synthetic_dataset(
        n, g, k, n_ratings=R, alpha_theta=args.alpha, alpha_p=args.alpha,
        seed=0,
    )
    train, test = train_test_split(ds, 0.2, seed=0)
    mesh = single_device_mesh()

    stats_fn = resolve_stats_fn(
        args.backend, g, k, n_samples=s, n_rows=len(train.triplets)
    )
    log(f"backend: {'pallas kernel' if stats_fn else 'jnp/XLA'}")
    tile = getattr(stats_fn, "tile_b", 0)
    train = train.pad_to(max(tile, 512))
    raw = Batch(
        triplets=jnp.asarray(train.triplets),
        ratings=jnp.asarray(train.ratings),
        weights=jnp.asarray(train.weights),
    )
    if getattr(stats_fn, "needs_rsort", False):
        from trigenicinteractionpredictor_tpu.ops.pallas_em_rsorted import (
            apply_rating_sort,
            rating_sort_pad,
        )

        rplan = rating_sort_pad(
            np.asarray(train.ratings), train.n_ratings,
            tile=stats_fn.tile_b, n_shards=1,
        )
        t_, r_, w_ = apply_rating_sort(
            rplan, np.asarray(train.triplets), np.asarray(train.ratings),
            np.asarray(train.weights),
        )
        raw = Batch(
            triplets=jnp.asarray(t_),
            ratings=jnp.asarray(r_),
            weights=jnp.asarray(w_),
            tile_rating=jnp.asarray(rplan.tile_r),
        )
    elif getattr(stats_fn, "needs_g1plan", False):
        from trigenicinteractionpredictor_tpu.ops.pallas_em_bdg import (
            apply_g1_order,
            make_g1_plan,
        )
        from trigenicinteractionpredictor_tpu.ops.pallas_em_large import (
            make_scatter_plan,
        )

        g1plan = make_g1_plan(
            np.asarray(train.triplets), g, wb1=stats_fn.wb1,
            tile=stats_fn.tile_b, n_shards=1,
        )
        t_, r_, w_ = apply_g1_order(
            g1plan, np.asarray(train.triplets), np.asarray(train.ratings),
            np.asarray(train.weights),
        )
        splan = make_scatter_plan(
            t_, g, n_shards=1, wb=stats_fn.wb, tile=stats_fn.tile_b,
            positions=(1, 2),
        )
        raw = Batch(
            triplets=jnp.asarray(t_),
            ratings=jnp.asarray(r_),
            weights=jnp.asarray(w_),
            scatter_perm=jnp.asarray(splan.perm),
            scatter_lid=jnp.asarray(splan.lid),
            scatter_block=jnp.asarray(splan.block),
            g1_lid=jnp.asarray(g1plan.lid1),
            g1_block=jnp.asarray(g1plan.blk1),
        )
    elif getattr(stats_fn, "needs_plan", False):
        from trigenicinteractionpredictor_tpu.ops.pallas_em_large import (
            make_scatter_plan,
        )

        plan = make_scatter_plan(
            np.asarray(train.triplets), g, n_shards=1,
            wb=stats_fn.wb, tile=stats_fn.tile_b,
        )
        raw = raw._replace(
            scatter_perm=jnp.asarray(plan.perm),
            scatter_lid=jnp.asarray(plan.lid),
            scatter_block=jnp.asarray(plan.block),
        )
    batch = shard_batch(mesh, raw)
    degrees = replicate(mesh, jnp.asarray(train.degrees()))
    step_kwargs = {} if stats_fn is None else {"stats_fn": stats_fn}
    step = make_sharded_multi_step(mesh, args.freq, **step_kwargs)

    keys = jax.random.split(jax.random.key(args.seed), s)
    states0 = shard_ensemble(
        mesh, jax.vmap(lambda kk: init_state(kk, g, k, R))(keys)
    )
    trips_te = jnp.asarray(test.triplets)
    labels_te = jnp.asarray((test.ratings == 1).astype(np.int32))
    w_te = jnp.asarray(test.weights)

    def check_auc(states) -> float:
        st = ModelState(
            theta=jnp.asarray(states.theta), p=jnp.asarray(states.p)
        )
        return float(auc(ensemble_predict_interaction(st, trips_te), labels_te, w_te))

    # Untimed compile pass: one training dispatch + one AUC evaluation.
    t0 = time.perf_counter()
    st_c, ll = step(states0, batch, degrees)
    _ = float(ll[-1, 0])
    _ = check_auc(st_c)
    log(f"compile pass: {time.perf_counter() - t0:.1f}s")

    # Bayes ceiling for context (the generating model's own ensemble AUC).
    bayes = float(
        auc(
            ensemble_predict_interaction(
                ModelState(
                    theta=jnp.asarray(theta_star[None]),
                    p=jnp.asarray(p_star[None]),
                ),
                trips_te,
            ),
            labels_te,
            w_te,
        )
    )

    states = states0
    t_train = 0.0
    history = []  # (cumulative train seconds, sweeps, ensemble AUC)
    final_ll = None
    for chk in range(args.max_sweeps // args.freq):
        t0 = time.perf_counter()
        states, ll = step(states, batch, degrees)
        ll_last = np.asarray(ll[-1])       # scalar fetch = the sync point
        t_train += time.perf_counter() - t0
        a = check_auc(states)              # outside the timer
        history.append((t_train, (chk + 1) * args.freq, a))
        final_ll = ll_last
    auc_final = history[-1][2]
    t_conv, sweeps_conv = next(
        (t, sw) for t, sw, a in history if a >= auc_final - args.tol
    )
    for t, sw, a in history:
        log(f"  t={t:7.3f}s sweeps={sw:4d} ensemble_auc={a:.4f}")
    log(
        f"converged AUC {auc_final:.4f} (Bayes {bayes:.4f}); within "
        f"{args.tol} after {sweeps_conv} sweeps / {t_conv:.3f}s post-compile"
    )
    report = evaluate(
        ModelState(
            theta=np.asarray(states.theta), p=np.asarray(states.p)
        ),
        test,
        np.asarray(final_ll, dtype=np.float64),
    )
    log(f"final evaluate(): auc={report.auc:.4f} best={report.best_sample_auc:.4f}")

    print(
        json.dumps(
            {
                "metric": "seconds_to_converged_auc",
                "value": round(t_conv, 3),
                "unit": "s",
                "auc_final": round(auc_final, 4),
                "auc_bayes": round(bayes, 4),
                "sweeps_to_converged": sweeps_conv,
                # Relay-independent time axis (round 5): warm-dispatch
                # seconds per sweep over the whole run — post-compile warm
                # execution is stable across relay health windows, unlike
                # claim/compile latency, so the perf gate multiplies this
                # by sweeps_to_converged instead of gating wall seconds.
                "seconds_per_sweep": round(
                    t_train / max(history[-1][1], 1), 5
                ),
                "shape": {"n": n, "g": g, "k": k, "s": s, "alpha": args.alpha,
                          "seed": args.seed},
            }
        )
    )


if __name__ == "__main__":
    main()
