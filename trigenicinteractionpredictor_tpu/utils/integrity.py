"""Runtime compute-integrity sentinel (SURVEY.md §6 "Failure detection").

The experimental axon TPU backend has been observed to miscompile fused
XLA graphs (see ops/em.py) in ways that silently corrupt results —
sufficient statistics come back ~100x too small while every op is correct
in isolation.  Because such bugs are fusion-context dependent, the engine
verifies itself at runtime: before a training run on an accelerator, one
EM-stats call on a synthetic probe batch is checked against the same
computation on the host CPU backend — for EVERY kernel family the
dispatcher can select on TPU (jnp, one-hot, bdr, bd-plan, hybrid, bdrg).

This is the TPU-era analog of the reference's implicit "likelihood must
increase" eyeball check — but automated, and run where silent corruption
would actually enter.

Error policy (round 5, ADVICE r4): a numeric MISMATCH or an exception
raised while EXECUTING a kernel's compute call fails the probe — both
mean the dispatchable kernel is broken on this backend.  An exception in
probe PLUMBING (plan building, tile fitting, batch prep) only warns and
skips that kernel's probe: a harness bug must not block every fit, but
it also must not silently pass as coverage — the warning names the lost
probe.
"""

from __future__ import annotations

import functools
import json
import os
import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class ComputeIntegrityError(RuntimeError):
    """The accelerator produced results inconsistent with the host CPU."""


# Relative tolerance for probe agreement.  f32 accumulation-order noise
# between the MXU one-hot-matmul scatter and the CPU segment-sum reaches
# ~2e-3 at probe scale (measured: theta_hat maxdiff 0.21 on scale 119);
# the miscompile this guards against was ~100% error, so 5e-3 separates
# the two regimes with margin on both sides.
_TOL = 5e-3


def _code_fingerprint() -> str:
    """Hash of the compute-path sources — invalidates cached verdicts.

    Covers EVERY kernel source the dispatcher can return (round 5 closed
    the bdrg/hybrid holes: editing a dispatched kernel must invalidate
    the cached PASS verdict, or a miscompile ships behind a stale cache).
    """
    import hashlib

    import trigenicinteractionpredictor_tpu.ops.em as em_mod
    import trigenicinteractionpredictor_tpu.ops.pallas_em as pk_mod
    import trigenicinteractionpredictor_tpu.ops.pallas_em_bd as bd_mod
    import trigenicinteractionpredictor_tpu.ops.pallas_em_bdg as bdg_mod
    import trigenicinteractionpredictor_tpu.ops.pallas_em_bdr as bdr_mod
    import trigenicinteractionpredictor_tpu.ops.pallas_em_bdrg as bdrg_mod
    import trigenicinteractionpredictor_tpu.ops.pallas_em_hybrid as hy_mod
    import trigenicinteractionpredictor_tpu.ops.pallas_em_large as lg_mod
    import trigenicinteractionpredictor_tpu.ops.pallas_em_rsorted as rs_mod
    import trigenicinteractionpredictor_tpu.ops.pallas_score as sc_mod

    h = hashlib.sha256()
    for mod in (
        em_mod, pk_mod, bd_mod, bdg_mod, bdr_mod, bdrg_mod, hy_mod,
        lg_mod, rs_mod, sc_mod,
    ):
        with open(mod.__file__, "rb") as fh:
            h.update(fh.read())
    h.update(jax.__version__.encode())
    return h.hexdigest()[:16]


def _cache_path() -> str:
    import trigenicinteractionpredictor_tpu as pkg

    root = os.path.dirname(os.path.dirname(os.path.abspath(pkg.__file__)))
    return os.path.join(root, ".integrity_cache.json")


def _cached_verdict(key: str):
    try:
        with open(_cache_path()) as fh:
            return json.load(fh).get(key)
    except Exception:
        return None


def _store_verdict(key: str, ok: bool) -> None:
    path = _cache_path()
    try:
        data = {}
        if os.path.exists(path):
            with open(path) as fh:
                data = json.load(fh)
        data[key] = bool(ok)
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(data, fh)
        os.replace(tmp, path)
    except Exception:
        pass  # cache is an optimization only


def _make_probe_case(n: int, g: int, k: int, r: int, arity: int, seed: int):
    """Synthetic rows + a state + the host-CPU reference stats."""
    from trigenicinteractionpredictor_tpu.models.mmsbm import init_state
    from trigenicinteractionpredictor_tpu.ops.em import Batch, em_sufficient_stats

    rng = np.random.default_rng(seed)
    trip = rng.integers(0, g, size=(n, arity), dtype=np.int32)
    ratings = rng.integers(0, r, size=n, dtype=np.int32)
    weights = np.ones(n, dtype=np.float32)
    state = init_state(jax.random.key(seed), g, k, r, arity=arity)
    theta_np, p_np = np.asarray(state.theta), np.asarray(state.p)

    def run(device, stats_fn):
        args = [
            jax.device_put(jnp.asarray(a), device)
            for a in (theta_np, p_np, trip, ratings, weights)
        ]
        out = jax.jit(
            lambda th, p, t, rr, w: stats_fn(th, p, Batch(t, rr, w))
        )(*args)
        return [np.asarray(x) for x in out]

    cpu = run(jax.devices("cpu")[0], em_sufficient_stats)
    return trip, ratings, weights, theta_np, p_np, cpu, run


def _check(tag: str, acc, cpu) -> bool:
    for name, a, c in zip(("theta_hat", "p_hat", "loglik"), acc, cpu):
        scale = max(float(np.abs(c).max()), 1.0)
        if float(np.abs(a - c).max()) > _TOL * scale:
            warnings.warn(
                f"integrity probe mismatch [{tag}] on {name}: "
                f"max|acc-cpu|={np.abs(a - c).max():.4g} vs {scale:.4g}"
            )
            return False
    return True


@functools.lru_cache(maxsize=None)
def _probe_result(
    platform: str, n: int, g: int, k: int, r: int, arity: int = 3
) -> bool:
    """Run the probe once per (platform, shape); cache the verdict.

    Checks every dispatchable compute path on the accelerator — the
    jnp/XLA graph plus each Pallas kernel family whose envelope fits a
    probe shape — against the host-CPU jnp result.
    """
    from trigenicinteractionpredictor_tpu.ops.dispatch import kernel_fits
    from trigenicinteractionpredictor_tpu.ops.em import Batch, em_sufficient_stats

    trip, ratings, weights, theta_np, p_np, cpu, run = _make_probe_case(
        n, g, k, r, arity, seed=0
    )

    dev = jax.devices()[0]
    ok = _check("jnp", run(dev, em_sufficient_stats), cpu)
    if ok and platform == "tpu" and arity == 3 and kernel_fits(g, k, 512):
        from trigenicinteractionpredictor_tpu.ops.pallas_em import (
            pallas_em_sufficient_stats,
        )

        ok = _check(
            "pallas",
            run(
                dev,
                lambda th, p, b: pallas_em_sufficient_stats(
                    th, p, b, interpret=False
                ),
            ),
            cpu,
        )
    if ok and platform == "tpu" and arity == 3:
        ok = _probe_bdr(dev, g, k, r, trip, ratings, weights,
                        theta_np, p_np, cpu)
    if ok and platform == "tpu" and arity == 3:
        ok = _probe_bdg_plan(dev, n, g, k, trip, ratings, weights,
                             theta_np, p_np, cpu)
    if ok and platform == "tpu" and arity == 3:
        # The plain bd-plan path stays dispatchable (very-large-G
        # fallback past the bdg pad bound) — probe it too.
        ok = _probe_bd_plan(dev, n, g, k, trip, ratings, weights,
                            theta_np, p_np, cpu)
    if ok and platform == "tpu" and arity == 3:
        # The stepwise mid-G dispatch default: probe at a G past the
        # one-hot family's ceiling so the probe exercises the same
        # envelope regime that dispatches hybrid in production.
        ok = _probe_hybrid(dev, k, r, arity)
    if ok and platform == "tpu" and arity == 3:
        # The K>50 dispatch default (grid-streamed restart groups).
        ok = _probe_bdrg(dev, r, arity)
    if ok and platform == "tpu" and arity == 3:
        # The serving kernel (ops/pallas_score.py): its output IS the
        # user-visible prediction, so a silent miscompile here matters as
        # much as one in training.
        ok = _probe_score(dev, g, k, r, trip, theta_np, p_np)
    return ok


def _probe_score(dev, g, k, r, trip, theta_np, p_np):
    """Probe the fused scoring kernel against the HIGHEST-precision jnp
    loop scorer on a 2-restart ensemble of distinct states."""
    try:  # plumbing
        from trigenicinteractionpredictor_tpu.models.mmsbm import (
            ModelState, init_state,
        )
        from trigenicinteractionpredictor_tpu.ops.pallas_score import (
            pallas_ensemble_predict_interaction,
            score_kernel_fits,
        )
        from trigenicinteractionpredictor_tpu.ops.scoring import (
            ensemble_predict_interaction,
        )

        if not score_kernel_fits(g, k, 2):
            return True
        st2 = init_state(jax.random.key(7), g, k, r, arity=3)
        thetas = np.stack([theta_np, np.asarray(st2.theta)])
        ps = np.stack([p_np, np.asarray(st2.p)])
        states = ModelState(
            theta=jax.device_put(jnp.asarray(thetas), dev),
            p=jax.device_put(jnp.asarray(ps), dev),
        )
        trips_d = jax.device_put(jnp.asarray(trip[:4096]), dev)
        cpu_dev = jax.devices("cpu")[0]
        states_c = ModelState(
            theta=jax.device_put(jnp.asarray(thetas), cpu_dev),
            p=jax.device_put(jnp.asarray(ps), cpu_dev),
        )
        want = np.asarray(
            ensemble_predict_interaction(
                states_c, jax.device_put(jnp.asarray(trip[:4096]), cpu_dev)
            )
        )
    except Exception as e:
        warnings.warn(
            f"integrity probe [score] plumbing failed, skipped: {e!r}"
        )
        return True

    try:  # compute
        got = np.asarray(
            jax.jit(
                lambda st, tr: pallas_ensemble_predict_interaction(
                    st, tr, interpret=False
                )
            )(states, trips_d)
        )
    except Exception as e:
        warnings.warn(f"integrity probe [score] kernel raised: {e!r}")
        return False
    # Probabilities are O(1); absolute tolerance covers the single-pass
    # MXU rounding (measured 1.1e-3 max on-chip).
    if float(np.abs(got - want).max()) > 5e-3:
        warnings.warn(
            "integrity probe mismatch [score]: "
            f"max|acc-cpu|={np.abs(got - want).max():.4g}"
        )
        return False
    return True


def _probe_bdr(dev, g, k, r, trip, ratings, weights, theta_np, p_np, cpu):
    """Probe the bdr kernel — the default TPU dispatch since round 3 —
    through its rating-sorted batch prep."""
    from trigenicinteractionpredictor_tpu.ops.em import Batch

    try:  # plumbing
        from trigenicinteractionpredictor_tpu.ops.dispatch import _fit_bdr_tile
        from trigenicinteractionpredictor_tpu.ops.pallas_em_bdr import (
            bdr_em_ensemble_stats,
        )
        from trigenicinteractionpredictor_tpu.ops.pallas_em_rsorted import (
            apply_rating_sort,
            rating_sort_pad,
        )

        fit = _fit_bdr_tile(g, k, 512, 1)
        if fit is None:
            return True
        tile = fit[0]
        rplan = rating_sort_pad(ratings, r, tile=tile, n_shards=1)
        trip_s, rat_s, w_s = apply_rating_sort(rplan, trip, ratings, weights)
        tile_r = jnp.asarray(rplan.tile_r)
        dev_args = [
            jax.device_put(jnp.asarray(a), dev)
            for a in (theta_np, p_np, trip_s, rat_s, w_s)
        ]
    except Exception as e:
        warnings.warn(f"integrity probe [bdr] plumbing failed, skipped: {e!r}")
        return True

    def run_bdr(th, p, b):
        out = bdr_em_ensemble_stats(
            th[None], p[None], b._replace(tile_rating=tile_r),
            tile_b=tile, interpret=False,
        )
        return jax.tree.map(lambda x: x[0], out)

    try:  # compute: an exception here means the dispatched kernel is broken
        out = jax.jit(
            lambda th, p, t, rr, w: run_bdr(th, p, Batch(t, rr, w))
        )(*dev_args)
        acc = [np.asarray(x) for x in out]
    except Exception as e:
        warnings.warn(f"integrity probe [bdr] kernel raised: {e!r}")
        return False
    return _check("bdr", acc, cpu)


def _probe_bdg_plan(dev, n, g, k, trip, ratings, weights, theta_np, p_np, cpu):
    """Probe the bdg path — the large-G dispatch default since round 5
    (block-diag E-step with fused g1-block gather/scatter + 2-position
    plan scatter).  A 2-lane ensemble of IDENTICAL states exercises the
    block-diagonal width; both lanes must match the CPU reference."""
    from trigenicinteractionpredictor_tpu.ops.em import Batch

    try:  # plumbing
        from trigenicinteractionpredictor_tpu.ops.dispatch import (
            _BDG_WB1,
            _fit_bd_plan_tile,
        )
        from trigenicinteractionpredictor_tpu.ops.pallas_em_bdg import (
            apply_g1_order,
            bdg_em_ensemble_stats,
            make_g1_plan,
        )
        from trigenicinteractionpredictor_tpu.ops.pallas_em_large import (
            make_scatter_plan,
        )

        # n_genes threaded (ADVICE r4): a G=0 query can never hit the
        # calibration table's large-G BAD entries.
        tile_bd = _fit_bd_plan_tile(k, 256, 2, n_genes=g, n_rows=n)
        if tile_bd is None:
            return True
        wb1 = min(_BDG_WB1, g)
        g1plan = make_g1_plan(trip, g, wb1=wb1, tile=tile_bd)
        trip_p, rat_p, w_p = apply_g1_order(g1plan, trip, ratings, weights)
        plan = make_scatter_plan(trip_p, g, n_shards=1, wb=256,
                                 tile=tile_bd, positions=(1, 2))
        n_blocks = -(-g // 256)
        dev_args = [
            jax.device_put(jnp.asarray(a), dev)
            for a in (theta_np, p_np, trip_p, rat_p, w_p)
        ]
        pl_args = [
            jax.device_put(jnp.asarray(a), dev)
            for a in (plan.perm, plan.lid, plan.block,
                      g1plan.lid1, g1plan.blk1)
        ]
    except Exception as e:
        warnings.warn(
            f"integrity probe [bdg-plan] plumbing failed, skipped: {e!r}"
        )
        return True

    def run_bdg(th, p, b):
        return bdg_em_ensemble_stats(
            jnp.stack([th, th]), jnp.stack([p, p]), b,
            tile_b=tile_bd, wb1=wb1, n_blocks1=-(-g // wb1),
            wb=256, n_blocks=n_blocks, interpret=False,
        )

    try:  # compute
        out2 = jax.jit(
            lambda th, p, t, rr, w, sp, sl, sb, gl, gb: run_bdg(
                th, p,
                Batch(t, rr, w, scatter_perm=sp, scatter_lid=sl,
                      scatter_block=sb, g1_lid=gl, g1_block=gb),
            )
        )(*dev_args, *pl_args)
        lane0 = [np.asarray(x)[0] for x in out2]
        lane1 = [np.asarray(x)[1] for x in out2]
    except Exception as e:
        warnings.warn(f"integrity probe [bdg-plan] kernel raised: {e!r}")
        return False
    # BOTH lanes must match the host reference at the probe tolerance.
    # Bitwise lane equality is deliberately NOT required: identical
    # inputs in different block-diagonal lane positions measured
    # theta_hat differences of 4.9e-4 on scale 119 (~4e-6 relative) on
    # the real MXU, with p_hat/loglik bitwise equal (first on-chip run
    # of this probe, 2026-08-21) — position-dependent accumulation
    # noise, which the lane-vs-reference checks bound at _TOL either way.
    return _check("bdg-plan[0]", lane0, cpu) and _check(
        "bdg-plan[1]", lane1, cpu
    )


def _probe_bd_plan(dev, n, g, k, trip, ratings, weights, theta_np, p_np, cpu):
    """Probe the plain bd-plan path (block-diag E-step + 3-position plan
    scatter) — the very-large-G fallback past the bdg pad bound."""
    from trigenicinteractionpredictor_tpu.ops.em import Batch

    try:  # plumbing
        from trigenicinteractionpredictor_tpu.ops.dispatch import (
            _fit_bd_plan_tile,
        )
        from trigenicinteractionpredictor_tpu.ops.pallas_em_bd import (
            bd_em_ensemble_stats,
        )
        from trigenicinteractionpredictor_tpu.ops.pallas_em_large import (
            make_scatter_plan,
        )

        tile_bd = _fit_bd_plan_tile(k, 256, 2, n_genes=g, n_rows=n)
        if tile_bd is None:
            return True
        arity = trip.shape[1]
        pad_n = -(-n // tile_bd) * tile_bd
        trip_p = np.zeros((pad_n, arity), np.int32)
        trip_p[:n] = trip
        rat_p = np.zeros(pad_n, np.int32)
        rat_p[:n] = ratings
        w_p = np.zeros(pad_n, np.float32)
        w_p[:n] = weights
        plan = make_scatter_plan(trip_p, g, n_shards=1, wb=256, tile=tile_bd)
        n_blocks = -(-g // 256)
        dev_args = [
            jax.device_put(jnp.asarray(a), dev)
            for a in (theta_np, p_np, trip_p, rat_p, w_p)
        ]
        pl_args = [
            jax.device_put(jnp.asarray(a), dev)
            for a in (plan.perm, plan.lid, plan.block)
        ]
    except Exception as e:
        warnings.warn(
            f"integrity probe [bd-plan] plumbing failed, skipped: {e!r}"
        )
        return True

    def run_bd(th, p, b):
        return bd_em_ensemble_stats(
            jnp.stack([th, th]), jnp.stack([p, p]), b,
            tile_b=tile_bd, wb=256, n_blocks=n_blocks, interpret=False,
        )

    try:  # compute
        out2 = jax.jit(
            lambda th, p, t, rr, w, sp, sl, sb: run_bd(
                th, p,
                Batch(t, rr, w, scatter_perm=sp, scatter_lid=sl,
                      scatter_block=sb),
            )
        )(*dev_args, *pl_args)
        lane0 = [np.asarray(x)[0] for x in out2]
        lane1 = [np.asarray(x)[1] for x in out2]
    except Exception as e:
        warnings.warn(f"integrity probe [bd-plan] kernel raised: {e!r}")
        return False
    return _check("bd-plan[0]", lane0, cpu) and _check(
        "bd-plan[1]", lane1, cpu
    )


def _probe_hybrid(dev, k, r, arity):
    """Probe the hybrid kernel at a mid-G shape (G past the one-hot
    family's VMEM ceiling — the regime where dispatch actually selects
    it for stepwise runs).  2-lane ensemble of distinct states."""
    from trigenicinteractionpredictor_tpu.ops.em import Batch

    n2, g2 = 4096, 3072
    try:  # plumbing
        from trigenicinteractionpredictor_tpu.ops.dispatch import (
            _fit_hybrid_tile,
        )
        from trigenicinteractionpredictor_tpu.ops.pallas_em_hybrid import (
            hybrid_em_ensemble_stats,
        )

        tile_h = _fit_hybrid_tile(g2, k, 256, 2)
        if tile_h is None:
            return True
        trip, ratings, weights, theta_np, p_np, cpu, _ = _make_probe_case(
            n2, g2, k, r, arity, seed=1
        )
        dev_args = [
            jax.device_put(jnp.asarray(a), dev)
            for a in (theta_np, p_np, trip, ratings, weights)
        ]
    except Exception as e:
        warnings.warn(
            f"integrity probe [hybrid] plumbing failed, skipped: {e!r}"
        )
        return True

    def run_hy(th, p, b):
        out = hybrid_em_ensemble_stats(
            jnp.stack([th, th]), jnp.stack([p, p]), b,
            tile_b=tile_h, interpret=False,
        )
        return jax.tree.map(lambda x: x[0], out)

    try:  # compute
        out = jax.jit(
            lambda th, p, t, rr, w: run_hy(th, p, Batch(t, rr, w))
        )(*dev_args)
        acc = [np.asarray(x) for x in out]
    except Exception as e:
        warnings.warn(f"integrity probe [hybrid] kernel raised: {e!r}")
        return False
    return _check("hybrid", acc, cpu)


def _probe_bdrg(dev, r, arity):
    """Probe the bdrg kernel at a small K=50/group=1 shape — the K>50
    dispatch band's family, through its rating-sorted prep."""
    from trigenicinteractionpredictor_tpu.ops.em import Batch

    n2, g2, k2 = 2048, 512, 50
    try:  # plumbing
        from trigenicinteractionpredictor_tpu.ops.dispatch import (
            _fit_bdrg_tile,
        )
        from trigenicinteractionpredictor_tpu.ops.pallas_em_bdrg import (
            bdrg_em_ensemble_stats,
        )
        from trigenicinteractionpredictor_tpu.ops.pallas_em_rsorted import (
            apply_rating_sort,
            rating_sort_pad,
        )

        fit = _fit_bdrg_tile(g2, k2, 128, 2, group=1)
        if fit is None:
            return True
        tile, group = fit
        trip, ratings, weights, theta_np, p_np, cpu, _ = _make_probe_case(
            n2, g2, k2, r, arity, seed=2
        )
        rplan = rating_sort_pad(ratings, r, tile=tile, n_shards=1)
        trip_s, rat_s, w_s = apply_rating_sort(rplan, trip, ratings, weights)
        tile_r = jnp.asarray(rplan.tile_r)
        dev_args = [
            jax.device_put(jnp.asarray(a), dev)
            for a in (theta_np, p_np, trip_s, rat_s, w_s)
        ]
    except Exception as e:
        warnings.warn(
            f"integrity probe [bdrg] plumbing failed, skipped: {e!r}"
        )
        return True

    def run_bdrg(th, p, b):
        out = bdrg_em_ensemble_stats(
            jnp.stack([th, th]), jnp.stack([p, p]),
            b._replace(tile_rating=tile_r),
            tile_b=tile, group=group, interpret=False,
        )
        return jax.tree.map(lambda x: x[0], out)

    try:  # compute
        out = jax.jit(
            lambda th, p, t, rr, w: run_bdrg(th, p, Batch(t, rr, w))
        )(*dev_args)
        acc = [np.asarray(x) for x in out]
    except Exception as e:
        warnings.warn(f"integrity probe [bdrg] kernel raised: {e!r}")
        return False
    return _check("bdrg", acc, cpu)


def check_em_integrity(
    n: int = 32768,
    n_genes: int = 512,
    k: int = 10,
    n_ratings: int = 2,
    raise_on_failure: bool = True,
    arity: int = 3,
) -> bool:
    """Verify accelerator EM stats against the host CPU. Cheap; cached.

    No-op (returns True) when already running on CPU.
    """
    platform = jax.devices()[0].platform
    if platform == "cpu":
        return True
    # On-disk verdict cache: the probe costs accelerator compiles (minutes
    # through the axon remote-compile relay), so one verdict per
    # (device, code fingerprint, shape) serves every process on the host.
    key = (
        f"{platform}:{jax.devices()[0].device_kind}:{_code_fingerprint()}:"
        f"{n}:{n_genes}:{k}:{n_ratings}:{arity}:{_TOL}"
    )
    cached = _cached_verdict(key)
    if cached is not None:
        ok = cached
        if not ok and raise_on_failure:
            raise ComputeIntegrityError(
                "cached integrity verdict is FAIL for this device/code — "
                "delete .integrity_cache.json to re-probe"
            )
        return ok
    ok = _probe_result(platform, n, n_genes, k, n_ratings, arity)
    _store_verdict(key, ok)
    if not ok and raise_on_failure:
        raise ComputeIntegrityError(
            "accelerator EM sufficient-statistics disagree with host CPU — "
            "refusing to train on silently-corrupt compute (see ops/em.py "
            "fusion notes)"
        )
    return ok
