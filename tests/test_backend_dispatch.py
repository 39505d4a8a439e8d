"""Backend dispatch: the Pallas kernel must slot into the sharded trainer
(vmap over restarts + shard_map over data) and reproduce the jnp path."""

import numpy as np
import pytest

from trigenicinteractionpredictor_tpu.config import Config, EngineConfig, MeshConfig, TrainConfig
from trigenicinteractionpredictor_tpu.data.splits import train_test_split
from trigenicinteractionpredictor_tpu.data.synthetic import sample_synthetic_dataset
from trigenicinteractionpredictor_tpu.ops.dispatch import kernel_fits, resolve_stats_fn
from trigenicinteractionpredictor_tpu.train.trainer import fit


def test_kernel_fits_budget():
    assert kernel_fits(1000, 10, 512)          # bench scale, on-chip validated
    assert kernel_fits(1300, 10, 256)          # Kuzmin gene count, smaller tile
    assert not kernel_fits(1300, 10, 512)      # 16 MB of one-hots alone
    assert not kernel_fits(200_000, 10, 512)   # too many genes
    # Wide ensembles eventually shrink the tile (S-wide lane streams);
    # S=10 at bench scale still fits through the production scan path.
    assert kernel_fits(1000, 10, 512, n_samples=10)
    assert not kernel_fits(1000, 10, 512, n_samples=24)
    assert kernel_fits(1000, 10, 256, n_samples=24)


def test_large_k_single_restart_kernel_fallback():
    # Ensemble kernel does not fit at K=50 x S=10; a 2-lane GROUP does,
    # and measured faster than per-restart (27.2M vs 26.2M upd/s,
    # on-chip 2026-08-20) — dispatch hands back the grouped ensemble fn.
    fn = resolve_stats_fn("pallas", 1000, 50, n_samples=10)
    assert fn is not None
    assert getattr(fn, "ensemble", False)
    assert fn.kernel_name == "pallas-onehot-grouped"
    # A single restart fits the plain ensemble kernel (S=1 lanes).
    fn1 = resolve_stats_fn("pallas", 1000, 50, n_samples=1)
    assert fn1 is not None and getattr(fn1, "tile_b", 0) > 0
    # Small K never takes the fallback: the ensemble kernel fits.
    fn_small = resolve_stats_fn("pallas", 1000, 10, n_samples=8)
    assert getattr(fn_small, "ensemble", False)


def test_serial_restart_map_matches_vmap():
    """K >= 32 flips restarts from vmap to lax.map — results identical."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from trigenicinteractionpredictor_tpu.data.synthetic import (
        sample_synthetic_dataset,
    )
    from trigenicinteractionpredictor_tpu.models import init_state
    from trigenicinteractionpredictor_tpu.ops.em import Batch, em_step
    from trigenicinteractionpredictor_tpu.parallel.mesh import make_mesh
    from trigenicinteractionpredictor_tpu.ops.em import SERIAL_RESTART_K
    from trigenicinteractionpredictor_tpu.parallel.sharded_em import (
        make_sharded_train_step,
        replicate,
        shard_batch,
        shard_ensemble,
    )

    k = SERIAL_RESTART_K
    ds, _, _ = sample_synthetic_dataset(256, 20, k, seed=2)
    batch = Batch(
        triplets=jnp.asarray(ds.triplets),
        ratings=jnp.asarray(ds.ratings),
        weights=jnp.asarray(ds.weights),
    )
    deg = jnp.asarray(ds.degrees())
    states = jax.vmap(lambda kk: init_state(kk, ds.n_genes, k, 2))(
        jax.random.split(jax.random.key(1), 2)
    )
    ref_states, ref_ll = jax.vmap(em_step, in_axes=(0, None, None))(
        states, batch, deg
    )
    mesh = make_mesh(data=2, ensemble=1)
    step = make_sharded_train_step(mesh)
    new_states, ll = step(
        shard_ensemble(mesh, states), shard_batch(mesh, batch), replicate(mesh, deg)
    )
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ref_ll), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_states.theta), np.asarray(ref_states.theta), atol=1e-5
    )


def test_resolve_auto_on_cpu_is_jnp():
    assert resolve_stats_fn("auto", 1000, 10) is None  # tests run on CPU
    assert resolve_stats_fn("jnp", 1000, 10) is None
    assert resolve_stats_fn("pallas", 1000, 10) is not None
    # Past the one-hot kernel's G ceiling, explicit pallas now resolves to
    # the large-G pre-gathered/sorted-scatter path (needs a batch plan).
    fn_large = resolve_stats_fn("pallas", 500_000, 10)
    assert getattr(fn_large, "needs_plan", False)
    assert getattr(fn_large, "ensemble", False)
    with pytest.raises(ValueError):
        resolve_stats_fn("nope", 10, 10)


@pytest.mark.slow
def test_pallas_backend_through_trainer_matches_jnp(tmp_path):
    """Full fit with backend='pallas' (interpret mode on CPU) == jnp fit.

    Exercises vmap(restarts) + shard_map(data) around the kernel.
    """
    ds, _, _ = sample_synthetic_dataset(600, 30, 3, n_ratings=2, seed=1)
    train, _ = train_test_split(ds, 0.2, seed=0)

    def cfg(backend):
        return Config(
            train=TrainConfig(k=3, sweeps=8, samples=2, likelihood_freq=4),
            mesh=MeshConfig(data=2, ensemble=2),
            engine=EngineConfig(backend=backend, tile_b=128, batch_pad_multiple=128),
            out_dir=str(tmp_path),
        )

    jnp_res = fit(cfg("jnp"), train)
    pl_res = fit(cfg("pallas"), train)
    np.testing.assert_allclose(
        pl_res.final_loglik, jnp_res.final_loglik, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(pl_res.states.theta),
        np.asarray(jnp_res.states.theta),
        atol=1e-4,
    )


def test_wide_ensemble_uses_grouped_kernel():
    """S > 10 lane-stacks in groups (one kernel call per group under
    lax.map): a single 50-wide call blows up the Mosaic program."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from trigenicinteractionpredictor_tpu.data.synthetic import (
        sample_synthetic_dataset,
    )
    from trigenicinteractionpredictor_tpu.models import init_state
    from trigenicinteractionpredictor_tpu.ops.dispatch import (
        _pallas_grouped_fn,
        _pick_group,
    )
    from trigenicinteractionpredictor_tpu.ops.em import Batch, em_sufficient_stats

    assert _pick_group(1000, 10, 512, 50) == 10
    # Prime S: no divisor, but the largest fitting group still works (the
    # grouped fn runs a narrower remainder call for the tail).
    assert _pick_group(1000, 10, 512, 17) == 10

    # Grouped kernel (interpret mode on CPU) == per-restart jnp stats.
    ds, _, _ = sample_synthetic_dataset(512, 20, 3, seed=8)
    ds = ds.pad_to(512)
    batch = Batch(
        triplets=jnp.asarray(ds.triplets),
        ratings=jnp.asarray(ds.ratings),
        weights=jnp.asarray(ds.weights),
    )
    S = 4
    states = jax.vmap(lambda k: init_state(k, ds.n_genes, 3, 2))(
        jax.random.split(jax.random.key(0), S)
    )
    fn = _pallas_grouped_fn(512, group=2)
    assert getattr(fn, "ensemble", False)
    stats = fn(states.theta, states.p, batch)
    ref = jax.vmap(
        lambda th, p: em_sufficient_stats(th, p, batch)
    )(states.theta, states.p)
    np.testing.assert_allclose(
        np.asarray(stats.theta_hat), np.asarray(ref.theta_hat), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(stats.loglik), np.asarray(ref.loglik), rtol=1e-5
    )

    # Non-divisor S: two full groups + a remainder call, same results.
    S3 = 3
    states3 = jax.vmap(lambda k: init_state(k, ds.n_genes, 3, 2))(
        jax.random.split(jax.random.key(1), S3)
    )
    stats3 = fn(states3.theta, states3.p, batch)
    ref3 = jax.vmap(
        lambda th, p: em_sufficient_stats(th, p, batch)
    )(states3.theta, states3.p)
    assert stats3.loglik.shape == (S3,)
    np.testing.assert_allclose(
        np.asarray(stats3.theta_hat), np.asarray(ref3.theta_hat), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(stats3.loglik), np.asarray(ref3.loglik), rtol=1e-5
    )


def test_auto_dispatch_table_on_tpu(monkeypatch):
    """Every branch of the two VMEM models, asserted for 'auto' as if on a
    real TPU: a silent fall-through to the jnp path at a kernel-capable
    shape is a ~12x perf cliff that must fail CI, not pass it (VERDICT r2
    item 2)."""
    import functools

    import jax

    from trigenicinteractionpredictor_tpu.ops.pallas_em import (
        pallas_em_ensemble_stats,
        pallas_em_sufficient_stats,
    )
    from trigenicinteractionpredictor_tpu.ops.pallas_em_hybrid import (
        hybrid_em_ensemble_stats,
    )

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    def kind_of(fn):
        if fn is None:
            return "jnp"
        if getattr(fn, "needs_rsort", False):
            return "bdr"
        if getattr(fn, "needs_g1plan", False):
            return "bdg"
        if getattr(fn, "needs_plan", False):
            return (
                "bd-plan"
                if getattr(fn, "kernel_name", "") == "pallas-bd-plan"
                else "plan"
            )
        if not getattr(fn, "ensemble", False):
            assert isinstance(fn, functools.partial)
            assert fn.func is pallas_em_sufficient_stats
            return "single"
        if isinstance(fn, functools.partial):
            if fn.func is hybrid_em_ensemble_stats:
                return "hybrid"
            assert fn.func is pallas_em_ensemble_stats
            return "ensemble"
        return "grouped"

    cases = [
        # (G, K, S) -> expected backend branch.  bdr (block-diag x rating-
        # sorted x one-hot) is the measured champion wherever it fits
        # (BASELINE.md round-3 race: 1.84x the one-hot kernel).
        (1000, 10, 1, "bdr"),           # bench S=1 datapoint
        (1000, 10, 10, "bdr"),          # the S=10 headline shape
        (1300, 10, 10, "bdr"),          # Kuzmin gene count (shrunken tile)
        (1000, 50, 10, "grouped"),      # large-K: 2-lane groups share
                                        # one-hots (27.2M vs 26.2M measured)
        (1000, 50, 1, "ensemble"),      # S=1: plain kernel fits at K=50
        # Large-K AND wide goes through _pick_group first, and at K=50 a
        # 2-lane group still fits VMEM — so S>10 lane-stacks in pairs while
        # S=10 runs per-restart.  Asserted as-is; tools/kernel_race.py is
        # the place to decide if the pair-group should win below the cap.
        (1000, 50, 12, "grouped"),
        # bdr has no lane-group cap (program size is S-independent), and
        # since the per-group operand restack its VMEM no longer scales
        # with S^2: S=17, S=50, S=100 all run as ONE kernel call
        # (measured 2026-08-20: S=50 508M upd/s at t256/g10, S=100 489M
        # at t128/g10 — vs 79M on the old grouped lax.map path).
        (1000, 10, 17, "bdr"),
        (1000, 10, 50, "bdr"),          # wide ensemble, single call
        (1000, 10, 100, "bdr"),         # pod-scale ensemble width
        (4_000, 10, 10, "bdr"),         # below the G-crossover: bdr 193M
        # Past G ~ 5000 the G-flat plan family beats bdr's G-scaled
        # one-hot matmuls (135M at 6k, 112M at 8k — round-4 crossover
        # sweep).  Round 5: the full-S pick is the g1-FUSED bdg kernel
        # (162M vs bd-plan's 143.6M at G=10k, same session).
        (6_000, 10, 10, "bdg"),
        (8_000, 10, 10, "bdg"),
        # Large-G: bdg measured 126.8M at G=100k vs bd-plan's 123.8M and
        # the per-restart plan path's 85.2M; S=1 has no ensemble to
        # batch, so it keeps the plan path.
        (100_000, 10, 10, "bdg"),
        (100_000, 10, 1, "plan"),
        # Very large G: bdg's per-block padding swamps the fused win
        # (G=500k/N=131k: 91% pad rows, 47.3M vs bd-plan's 67.6M) —
        # dispatch falls back to the unpadded bd-plan path there
        # (_bdg_pad_ok; no G ceiling on either plan path).
        (500_000, 10, 10, "bd-plan"),
        (30_000, 10, 10, "bdg"),        # between hybrid ceiling and 100k
        # Wide-S large-G: restart-grouped bdg (188.7M at S=50/G=10k/g=10
        # vs the round-4 bd-plan-grouped 172M).
        (10_000, 10, 50, "bdg"),
    ]
    for g, k, s, expected in cases:
        fn = resolve_stats_fn("auto", g, k, n_samples=s)
        got = kind_of(fn)
        assert got == expected, f"(G={g}, K={k}, S={s}): {got} != {expected}"
        if expected != "jnp":
            assert getattr(fn, "tile_b", 0) >= 128, (g, k, s)

    # The measured group rule (tools/bdr_group_sweep.py): largest divisor
    # of S with g*K <= 128 lanes; prime-ish S takes one wide group <= 256.
    from trigenicinteractionpredictor_tpu.ops.dispatch import _pick_bdr_group

    assert _pick_bdr_group(10, 10) == 10   # headline: one matmul per stage
    assert _pick_bdr_group(20, 10) == 10   # S=20: 438M at g=10 vs 316M g=20
    assert _pick_bdr_group(50, 10) == 10
    assert _pick_bdr_group(100, 10) == 10
    assert _pick_bdr_group(17, 10) == 17   # prime S: one wide group
    assert _pick_bdr_group(10, 16) == 5    # 5*16=80 lanes <= 128
    assert _pick_bdr_group(10, 20) == 5
    for s_w, g_w in [(50, 10), (100, 10)]:
        fn = resolve_stats_fn("auto", 1000, 10, n_samples=s_w)
        assert getattr(fn, "bdr_group", 0) == g_w, (s_w, fn.bdr_group)

    # Stepwise keeps bdr past the crossover (no scatter plan on
    # reshuffled minibatches):
    assert kind_of(resolve_stats_fn("auto", 6000, 10, n_samples=10,
                                    static_rows=False,
                                    minibatch_rsort=True)) == "bdr"
    # Stepwise (static_rows=False) excludes the row-order-baking kernels:
    # the headline shape falls back to the one-hot ensemble kernel, and
    # the mid-G regime to the hybrid kernel (XLA gather, order-free).
    assert kind_of(resolve_stats_fn("auto", 1000, 10, n_samples=10,
                                    static_rows=False)) == "ensemble"
    assert kind_of(resolve_stats_fn("auto", 4000, 10, n_samples=10,
                                    static_rows=False)) == "hybrid"
    assert kind_of(resolve_stats_fn("auto", 100_000, 10, n_samples=10,
                                    static_rows=False)) == "jnp"
    # ... unless the caller re-sorts each minibatch itself
    # (minibatch_rsort=True — the stepwise trainer does): bdr returns,
    # while the whole-dataset scatter-plan path stays excluded.
    assert kind_of(resolve_stats_fn("auto", 1000, 10, n_samples=10,
                                    static_rows=False,
                                    minibatch_rsort=True)) == "bdr"
    assert kind_of(resolve_stats_fn("auto", 100_000, 10, n_samples=10,
                                    static_rows=False,
                                    minibatch_rsort=True)) == "jnp"


def test_resolved_kernels_carry_tile_b():
    """The trainer distinguishes Pallas kernels from the jnp row-chunk
    partial by the .tile_b attribute (batch padding gate)."""
    fn = resolve_stats_fn("pallas", 1000, 10, n_samples=8)
    assert getattr(fn, "tile_b", 0) > 0
    fn1 = resolve_stats_fn("pallas", 1000, 50, n_samples=1)  # single-restart
    assert getattr(fn1, "tile_b", 0) > 0
    # Explicit pallas + wide ensemble resolves to the grouped fn anywhere
    # (no silent TPU-only gate).
    fng = resolve_stats_fn("pallas", 1000, 10, n_samples=17)
    assert getattr(fng, "ensemble", False) and getattr(fng, "tile_b", 0) > 0


def test_bdr_group_knob_validation_and_roundtrip(monkeypatch):
    """VERDICT r3 item 7 + ADVICE r3: the bdr_group override must be a
    divisor of the per-device restart count, validated with a clear error
    at resolve time (not an opaque in-kernel assert), and the resolved
    choice must ride on the returned fn for serialization."""
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with pytest.raises(ValueError, match="divisor"):
        resolve_stats_fn("auto", 1000, 10, n_samples=10, bdr_group=3)
    with pytest.raises(ValueError, match="divisor"):
        resolve_stats_fn("auto", 1000, 10, n_samples=10, bdr_group=-2)
    # Forced group equal to the pick: honored.
    fn = resolve_stats_fn("auto", 1000, 10, n_samples=10, bdr_group=10)
    assert getattr(fn, "bdr_group", 0) == 10
    # Forced group below the pick but calibrated GOOD on-chip
    # (ops/vmem_calibration.json: [1000, 10, 10, 5, 512]): honored at the
    # calibrated tile.
    fn5 = resolve_stats_fn("auto", 1000, 10, n_samples=10, bdr_group=5)
    assert getattr(fn5, "bdr_group", 0) == 5
    assert getattr(fn5, "tile_b", 0) == 512
    # Forced-narrow at an UNCALIBRATED G: conservative tile step-down
    # (many-group concat pressure is non-monotone in group width — the
    # measured t256/K20/g2 trap).
    fn_u = resolve_stats_fn("auto", 1500, 10, n_samples=10, bdr_group=2)
    fn_auto = resolve_stats_fn("auto", 1500, 10, n_samples=10)
    if fn_u is not None and fn_auto is not None:
        assert fn_u.tile_b <= fn_auto.tile_b // 2 or fn_u.tile_b == 128


def test_calibration_table_dominance():
    """The measured-shape table (ops/calibration.py) decides dispatch:
    bad entries veto analytic-admitted shapes; good entries prove
    dominated shapes; K and group never generalize."""
    from trigenicinteractionpredictor_tpu.ops import calibration
    from trigenicinteractionpredictor_tpu.ops.dispatch import bdr_kernel_fits

    c = calibration.classify
    # The pinned round-3 trap: t256/K20/g2 OOM'd on-chip.
    assert c("bdr", 1000, 20, 10, 2, 256) == calibration.BAD
    assert not bdr_kernel_fits(1000, 20, 256, 10, group=2)
    # ... while g=5 at the same tile measured good.
    assert c("bdr", 1000, 20, 10, 5, 256) == calibration.GOOD
    assert bdr_kernel_fits(1000, 20, 256, 10, group=5)
    # Dominance: smaller G/S/tile inherit GOOD at fixed (K, group) ...
    assert c("bdr", 800, 10, 10, 10, 256) == calibration.GOOD
    # ... larger G/S/tile inherit BAD at fixed (K, group) ...
    assert c("bdr", 2000, 10, 50, 10, 512) == calibration.BAD
    # ... and nothing generalizes across K or group.
    assert c("bdr", 1000, 13, 10, 10, 512) == calibration.UNKNOWN
    assert c("bdr", 1000, 20, 10, 4, 256) == calibration.UNKNOWN
    # Unknown families fall through to the analytic envelope.
    assert c("nosuch", 1000, 10, 10, 10, 512) == calibration.UNKNOWN


def test_precision_knob_validation_and_threading(monkeypatch):
    """VERDICT r3 item 4: EngineConfig.precision='strict' must reach the
    kernel factories (HIGHEST on every kernel matmul)."""
    import jax

    with pytest.raises(ValueError, match="precision"):
        resolve_stats_fn("auto", 1000, 10, n_samples=10, precision="hmm")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    def strict_of(fn):
        kw = getattr(fn, "keywords", None)
        return kw["strict"] if kw is not None else fn.strict

    for shape in [(1000, 10, 10), (1000, 50, 10), (4000, 10, 10)]:
        g, k, s = shape
        fn = resolve_stats_fn("auto", g, k, n_samples=s, precision="strict")
        assert fn is not None
        assert strict_of(fn) is True, shape
        fn_fast = resolve_stats_fn("auto", g, k, n_samples=s)
        assert strict_of(fn_fast) is False, shape


def test_strict_mode_kernel_parity():
    """strict=True changes numerics only on real MXU hardware; in
    interpret mode (CPU f32) it must be exactly the fast path, which is
    itself tested against the jnp oracle."""
    import jax
    import jax.numpy as jnp

    from trigenicinteractionpredictor_tpu.models import init_state
    from trigenicinteractionpredictor_tpu.ops.em import Batch
    from trigenicinteractionpredictor_tpu.ops.pallas_em import (
        pallas_em_ensemble_stats,
    )

    ds, _, _ = sample_synthetic_dataset(512, 40, 4, seed=3)
    batch = Batch(
        triplets=jnp.asarray(ds.triplets),
        ratings=jnp.asarray(ds.ratings),
        weights=jnp.asarray(ds.weights),
    )
    keys = jax.random.split(jax.random.key(0), 3)
    states = jax.vmap(lambda kk: init_state(kk, 40, 4, 2))(keys)
    fast = pallas_em_ensemble_stats(
        states.theta, states.p, batch, tile_b=128, interpret=True
    )
    strict = pallas_em_ensemble_stats(
        states.theta, states.p, batch, tile_b=128, interpret=True, strict=True
    )
    np.testing.assert_allclose(
        np.asarray(fast.theta_hat), np.asarray(strict.theta_hat), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(fast.loglik), np.asarray(strict.loglik), rtol=1e-6
    )


def test_fit_records_dispatch_decision(tmp_path):
    """The resolved kernel family/tile/group/precision rides in
    FitResult.dispatch and in the checkpoint (extra_dispatch_json)."""
    import json

    from trigenicinteractionpredictor_tpu.train.checkpoint import (
        load_checkpoint,
    )

    ds, _, _ = sample_synthetic_dataset(600, 30, 3, seed=0)
    cfg = Config(
        train=TrainConfig(k=3, sweeps=4, samples=2, likelihood_freq=2),
        engine=EngineConfig(backend="jnp", precision="strict"),
    )
    ck = str(tmp_path / "ck.npz")
    res = fit(cfg, ds, checkpoint_path=ck)
    assert res.dispatch["kernel"] == "jnp"
    assert res.dispatch["precision"] == "strict"
    loaded = load_checkpoint(ck)
    dj = json.loads(bytes(loaded["extra"]["dispatch_json"]).decode())
    assert dj == res.dispatch

    # Pallas path (interpret on CPU): kernel name + tile + group recorded.
    cfg2 = Config(
        train=TrainConfig(k=3, sweeps=2, samples=2, likelihood_freq=2),
        engine=EngineConfig(backend="pallas", tile_b=128),
    )
    res2 = fit(cfg2, ds)
    assert res2.dispatch["kernel"].startswith("pallas-")
    assert res2.dispatch["tile_b"] >= 128


def test_k_band_dispatch(monkeypatch):
    """K-band frontier, pinned by on-chip measurement (N=131k, S=10;
    round-4 rows 2026-08-20, round-5 rsorted race 2026-08-21): K=25
    keeps the one-hot ensemble kernel (95.3M upd/s vs bdr's 91.6M and
    rsorted's 86.7M), K=50 takes 2-lane one-hot groups (26.7M vs 26.9M
    rsorted-g2 — a tie inside run noise; incumbent kept), K=64 takes the
    per-restart one-hot kernel at t128 (17.6M vs 16.6M rsorted, 11.1M
    bdrg), and K=80+ falls back to jnp (bdrg's compile frontier is
    K=64).  Exact assertions (VERDICT r4 weak #4): a silent flip between
    families must fail CI even where the measured gap is small."""
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    fn25 = resolve_stats_fn("auto", 1000, 25, n_samples=10)
    assert fn25.kernel_name == "pallas-onehot-ensemble"
    fn50 = resolve_stats_fn("auto", 1000, 50, n_samples=10)
    assert fn50.kernel_name == "pallas-onehot-grouped"
    fn64 = resolve_stats_fn("auto", 1000, 64, n_samples=10)
    assert fn64.kernel_name == "pallas-onehot-single", fn64.kernel_name
    assert fn64.tile_b == 128, fn64.tile_b
    fn80 = resolve_stats_fn("auto", 1000, 80, n_samples=10)
    assert fn80 is None or fn80.kernel_name not in ("pallas-bdrg",)


def test_vmem_calibrate_merge_roundtrip(tmp_path, monkeypatch):
    """tools/vmem_calibrate.py merge folds probe results into the
    calibration table and dispatch picks them up (VERDICT r3 item 5)."""
    import importlib.util
    import json as _json

    from trigenicinteractionpredictor_tpu.ops import calibration

    spec = importlib.util.spec_from_file_location(
        "vmem_calibrate", "tools/vmem_calibrate.py"
    )
    vc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vc)

    # Redirect the table to a scratch file.
    scratch = tmp_path / "cal.json"
    monkeypatch.setattr(calibration, "_CAL_PATH", str(scratch))
    results = tmp_path / "res.jsonl"
    rows = [
        dict(family="bdr", n=65536, G=1500, K=13, S=10, group=5, tile=256,
             ok=True, upd_per_s=123),
        dict(family="bdr", n=65536, G=1500, K=13, S=10, group=5, tile=512,
             ok=False, error="JaxRuntimeError", detail="OOM"),
        dict(family="bdr", n=65536, G=1500, K=13, S=10, group=2, tile=512,
             ok=False, error="timeout", detail="alarm"),  # recorded as NOTHING
    ]
    results.write_text("\n".join(_json.dumps(r) for r in rows))

    class A:
        pass

    a = A()
    a.results = str(results)
    vc.cmd_merge(a)
    # GOOD entries carry the probe N (round 5): they prove n <= probe N
    # only — the axon compile ceiling is grid-count-dependent.
    assert (
        calibration.classify("bdr", 1500, 13, 10, 5, 256, n=65536)
        == calibration.GOOD
    )
    assert (
        calibration.classify("bdr", 1200, 13, 10, 5, 128, n=32768)
        == calibration.GOOD
    )
    assert (
        calibration.classify("bdr", 1500, 13, 10, 5, 256, n=131072)
        == calibration.UNKNOWN
    ), "a GOOD probe at N=65k must not admit N=131k (compile ceiling)"
    # BAD entries veto N-independently (can't distinguish VMEM OOM from
    # the compile ceiling in the truncated HTTP-500 detail).
    assert (
        calibration.classify("bdr", 1500, 13, 10, 5, 512, n=32768)
        == calibration.BAD
    )
    assert calibration.classify("bdr", 1500, 13, 10, 5, 512) == calibration.BAD
    assert calibration.classify("bdr", 1500, 13, 10, 2, 512) == calibration.UNKNOWN

    # emit writes a runnable job file
    a2 = A()
    a2.family = "bdr"
    a2.queue = str(tmp_path)
    a2.results = str(results)
    a2.shapes = ["1000,10,10,10,512"]
    vc.cmd_emit(a2)
    job = (tmp_path / "cal_bdr.py").read_text()
    assert "SHAPES = [(1000, 10, 10, 10, 512)]" in job
    compile(job, "cal_bdr.py", "exec")  # syntactically valid
