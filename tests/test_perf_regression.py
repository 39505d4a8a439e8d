"""Benchmark regression gate (SURVEY.md §5 tier 6: "asserted not to
regress").

tests/conftest.py forces the CPU backend for the whole suite, so these
tests measure in a SUBPROCESS with the axon environment intact: bench.py —
the same harness the round driver runs — is the measurement vehicle, and a
fresh number below ``floor_fraction`` of the checked-in record
(tests/perf_records.json) fails the test.  The records are round-1 on-chip
measurements (BASELINE.md); update them only upward from verified runs.

Self-skips when no TPU is reachable (CI hosts without the axon chip).
"""

import json
import os
import re
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
RECORDS = json.load(open(os.path.join(HERE, "perf_records.json")))

_TPU_ENV = {
    **os.environ,
    "PYTHONPATH": f"{REPO}:/root/.axon_site",
}
# Drop the CPU-forcing knobs the suite environment may carry.
_TPU_ENV.pop("JAX_PLATFORMS", None)
_TPU_ENV.pop("XLA_FLAGS", None)


def _tpu_available() -> bool:
    try:
        out = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.default_backend())"],
            env=_TPU_ENV, capture_output=True, text=True, timeout=120,
        )
        return out.stdout.strip() == "tpu"
    except (subprocess.TimeoutExpired, OSError):
        return False


pytestmark = [
    pytest.mark.tpu,
    pytest.mark.slow,
    pytest.mark.skipif(not _tpu_available(), reason="no TPU reachable"),
]


def _run_bench(extra_args, timeout=900, warm_timeout=2700):
    """Warm pass (compile only, generous budget) then measured pass (tight
    budget).  The warm pass seeds the persistent compile cache, so the
    measured pass's timeout gates THROUGHPUT, not the axon relay's
    load-dependent first-compile latency (1.5-516s observed) — the round-2
    gate conflated the two and cried wolf on a 900s cold compile."""
    warm = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "bench.py"),
            "--warm-only", "--sweeps", "10", *extra_args,
        ],
        env=_TPU_ENV, capture_output=True, text=True, timeout=warm_timeout,
    )
    assert warm.returncode == 0, (
        f"warm (compile-only) pass failed:\n{warm.stderr[-2000:]}"
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), *extra_args],
        env=_TPU_ENV, capture_output=True, text=True, timeout=timeout,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    return result, proc.stderr


def test_headline_ensemble_throughput_and_target():
    """S=10 production shape: >= 0.7x the recorded 167M updates/s AND the
    bench's own vs_baseline >= the 100x BASELINE.json target."""
    result, stderr = _run_bench(["--sweeps", "60"])
    floor = RECORDS["floor_fraction"] * RECORDS["records"]["ensemble_s10_k10"]
    assert result["value"] >= floor, (
        f"S=10 throughput regressed: {result['value']:.3g} < {floor:.3g} "
        f"(record {RECORDS['records']['ensemble_s10_k10']:.3g}); bench stderr:\n"
        + stderr[-1000:]
    )
    assert result["vs_baseline"] >= RECORDS["vs_baseline_min"], result

    # The same bench run logs the single-restart datapoint to stderr.
    m = re.search(
        r"x 1 restarts in .*-> ([\d,]+) restart-triplet updates/s", stderr
    )
    assert m, f"S=1 line missing from bench stderr:\n{stderr[-1000:]}"
    s1 = float(m.group(1).replace(",", ""))
    floor1 = RECORDS["floor_fraction"] * RECORDS["records"]["single_s1_k10"]
    assert s1 >= floor1, f"S=1 throughput regressed: {s1:.3g} < {floor1:.3g}"


def test_wide_ensemble_throughput():
    """S=50 x K=10 (single-call bdr after the per-group operand restack):
    >= 0.7x of the recorded 506M updates/s.  Guards both the wide-S VMEM
    envelope (a silent fall-through to the old lax.map path would show as
    a ~6x cliff to ~79M) and the group-picker rule."""
    result, stderr = _run_bench(["-s", "50", "--sweeps", "60"], timeout=1800)
    assert "bdr rating-sort" in stderr, (
        f"S=50 did not dispatch to the bdr kernel:\n{stderr[-1000:]}"
    )
    floor = RECORDS["floor_fraction"] * RECORDS["records"]["wide_s50_k10"]
    assert result["value"] >= floor, (
        f"S=50 throughput regressed: {result['value']:.3g} < {floor:.3g}; "
        f"bench stderr:\n{stderr[-1000:]}"
    )


def test_large_k_throughput():
    """K=50 x S=10 (grouped/serial-restart kernel regime): >= 0.7x of the
    recorded 21.7M updates/s."""
    result, stderr = _run_bench(
        ["-k", "50", "--sweeps", "30", "-n", "32768"], timeout=1800
    )
    # Record was measured at N=131072; the smaller N here trades wall time
    # for a modest amortization penalty already covered by the 0.7 floor.
    floor = RECORDS["floor_fraction"] * RECORDS["records"]["large_k50_s10"]
    assert result["value"] >= floor, (
        f"K=50 throughput regressed: {result['value']:.3g} < {floor:.3g}; "
        f"bench stderr:\n{stderr[-1000:]}"
    )


def test_large_g_throughput():
    """G=100k x S=10 (pre-gathered + sorted-block-scatter path, a config
    the one-hot kernel cannot run at all): >= 0.7x of the recorded 85M
    updates/s."""
    result, stderr = _run_bench(
        ["-g", "100000", "--sweeps", "60"], timeout=1800
    )
    assert "large-G plan" in stderr, (
        f"G=100k did not dispatch to the large-G path:\n{stderr[-1000:]}"
    )
    floor = RECORDS["floor_fraction"] * RECORDS["records"]["large_g100k_s10"]
    assert result["value"] >= floor, (
        f"G=100k throughput regressed: {result['value']:.3g} < {floor:.3g}; "
        f"bench stderr:\n{stderr[-1000:]}"
    )


@pytest.mark.parametrize("which", ["default", "recoverable"])
def test_time_to_converged_auc(which):
    """The second north-star axis (BASELINE.json:2): post-compile seconds
    until the ensemble held-out AUC reaches its converged plateau, plus
    the plateau itself.  Two records (round 4): 'default' tracks parity
    on the production detection-threshold shape; 'recoverable' gates a
    Bayes-recoverable shape (AUC 0.688 vs chance 0.5) so a broken
    ensemble average or normalize tail moves a number with room to fall
    (VERDICT r3 item 3)."""
    q = RECORDS["quality"][which]
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench_quality.py"), *q["args"]],
        env=_TPU_ENV, capture_output=True, text=True, timeout=2700,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    ceiling = q["seconds_to_converged_auc"] * q["seconds_ceiling_factor"]
    assert result["value"] <= ceiling, (
        f"time-to-converged-AUC regressed: {result['value']:.3f}s > "
        f"{ceiling:.3f}s (record {q['seconds_to_converged_auc']}s); "
        f"stderr:\n{proc.stderr[-1000:]}"
    )
    assert abs(result["auc_final"] - q["auc_final"]) <= q["auc_band"], (
        f"converged AUC moved: {result['auc_final']} vs record "
        f"{q['auc_final']} +/- {q['auc_band']}"
    )
    floor = q.get("auc_chance_floor")
    if floor is not None:
        assert result["auc_final"] >= floor, (
            f"recoverable-config AUC collapsed toward chance: "
            f"{result['auc_final']} < {floor}"
        )


def test_wide_large_g_throughput():
    """S=50 x G=10000 (grouped bd-plan, round 4): the wide-S large-G band
    previously fell to the jnp path (~5M upd/s); the restart-grouped
    bd-plan runs it at 172M.  >= 0.7x of the record guards both the
    grouped wrapper and the G-crossover preference."""
    result, stderr = _run_bench(
        ["-g", "10000", "-s", "50", "--sweeps", "40"], timeout=1800
    )
    assert "large-G plan" in stderr, (
        f"G=10k/S=50 did not dispatch to a plan path:\n{stderr[-1000:]}"
    )
    floor = RECORDS["floor_fraction"] * RECORDS["records"]["bd_plan_wide_s50_g10k"]
    assert result["value"] >= floor, (
        f"wide large-G throughput regressed: {result['value']:.3g} < "
        f"{floor:.3g}; bench stderr:\n{stderr[-1000:]}"
    )
