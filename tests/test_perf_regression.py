"""Benchmark regression gate (SURVEY.md §5 tier 6: "asserted not to
regress").

tests/conftest.py forces the CPU backend for the whole suite, so these
tests measure in a SUBPROCESS with the axon environment intact: bench.py —
the same harness the round driver runs — is the measurement vehicle, and a
fresh number below ``floor_fraction`` of the checked-in record
(tests/perf_records.json) fails the test.  The records are on-chip
measurements (BASELINE.md); update them only upward from verified runs.

Shape-keying (round 5): every record stores BOTH the shape it was measured
at and the bench.py args the gate must run; the gate reads its arguments
from the record (``_record_args``), and tests/test_perf_records_schema.py
asserts the two agree — a record/gate shape divergence (the round-4
``large_k50_s10`` incident, BASELINE.md gate note) cannot recur.

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


def _record(name):
    return RECORDS["records"][name]


def _run_bench(record_name, timeout=900, warm_timeout=2700):
    """Warm pass (compile only, generous budget) then measured pass (tight
    budget).  The warm pass seeds the persistent compile cache, so the
    measured pass's timeout gates THROUGHPUT, not the axon relay's
    load-dependent first-compile latency (1.5-516s observed) — the round-2
    gate conflated the two and cried wolf on a 900s cold compile.

    The bench arguments come FROM the record (shape-keying): the gate can
    only ever measure the shape the record was set at."""
    extra_args = _record(record_name)["args"]
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


def _assert_floor(result_value, record_name, stderr=""):
    rec = _record(record_name)
    floor = RECORDS["floor_fraction"] * rec["value"]
    shape = {k: rec[k] for k in ("n", "g", "k", "s")}
    assert result_value >= floor, (
        f"{record_name} throughput regressed at {shape}: "
        f"{result_value:.3g} < {floor:.3g} (record {rec['value']:.3g}); "
        f"bench stderr:\n{stderr[-1000:]}"
    )


def test_headline_ensemble_throughput_and_target():
    """S=10 production shape: >= 0.7x the recorded 426M updates/s AND the
    bench's own vs_baseline >= the 100x BASELINE.json target."""
    result, stderr = _run_bench("ensemble_s10_k10")
    _assert_floor(result["value"], "ensemble_s10_k10", stderr)
    assert result["vs_baseline"] >= RECORDS["vs_baseline_min"], result

    # The same bench run logs the single-restart datapoint to stderr.
    m = re.search(
        r"x 1 restarts in .*-> ([\d,]+) restart-triplet updates/s", stderr
    )
    assert m, f"S=1 line missing from bench stderr:\n{stderr[-1000:]}"
    s1 = float(m.group(1).replace(",", ""))
    _assert_floor(s1, "single_s1_k10", stderr)


def test_wide_ensemble_throughput():
    """S=50 x K=10 (single-call bdr after the per-group operand restack):
    >= 0.7x of the recorded 506M updates/s.  Guards both the wide-S VMEM
    envelope (a silent fall-through to the old lax.map path would show as
    a ~6x cliff to ~79M) and the group-picker rule."""
    result, stderr = _run_bench("wide_s50_k10", timeout=1800)
    assert "bdr rating-sort" in stderr, (
        f"S=50 did not dispatch to the bdr kernel:\n{stderr[-1000:]}"
    )
    _assert_floor(result["value"], "wide_s50_k10", stderr)


def test_large_k_throughput():
    """K=50 x S=10 (grouped/serial-restart kernel regime): >= 0.7x of the
    record, measured AND gated at N=32768 (shape lives in the record)."""
    result, stderr = _run_bench("large_k50_s10", timeout=1800)
    _assert_floor(result["value"], "large_k50_s10", stderr)


def test_large_g_throughput():
    """G=100k x S=10 (bd-plan: block-diag E-step + sorted-block scatter, a
    config the one-hot kernel cannot run at all): >= 0.7x of the recorded
    124M updates/s."""
    result, stderr = _run_bench("large_g100k_s10", timeout=1800)
    assert "large-G plan" in stderr, (
        f"G=100k did not dispatch to the large-G path:\n{stderr[-1000:]}"
    )
    _assert_floor(result["value"], "large_g100k_s10", stderr)


@pytest.mark.parametrize("which", ["default", "recoverable"])
def test_time_to_converged_auc(which):
    """The second north-star axis (BASELINE.json:2): time-to-converged
    held-out AUC, gated through RELAY-INDEPENDENT quantities (round 5,
    VERDICT r4 weak #1):

    - ``sweeps_to_converged`` — how many EM sweeps until the ensemble AUC
      is within tol of its plateau.  Pure algorithm: immune to relay
      claim/compile jitter.  Slack covers tol-crossing jitter between
      adjacent likelihood checks.
    - ``seconds_per_sweep`` — warm-dispatch device seconds per sweep.
      Post-compile warm execution is stable across relay health windows
      (BASELINE.md round-4 telemetry); factor 2.5 covers dispatch noise.

    Their product IS seconds-to-converged-AUC, so the old 25x/10x
    wall-clock ceilings are gone.  The AUC plateau itself stays banded:
    'default' tracks parity on the production detection-threshold shape;
    'recoverable' gates a Bayes-recoverable shape (AUC 0.688 vs chance
    0.5) so a broken ensemble average or normalize tail moves a number
    with room to fall (VERDICT r3 item 3)."""
    q = RECORDS["quality"][which]
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench_quality.py"), *q["args"]],
        env=_TPU_ENV, capture_output=True, text=True, timeout=2700,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    sweeps_ceiling = q["sweeps_to_converged"] + q["sweeps_slack"]
    assert result["sweeps_to_converged"] <= sweeps_ceiling, (
        f"convergence slowed: {result['sweeps_to_converged']} sweeps to "
        f"plateau > {sweeps_ceiling} (record {q['sweeps_to_converged']} + "
        f"slack {q['sweeps_slack']}); stderr:\n{proc.stderr[-1000:]}"
    )
    sps_ceiling = q["seconds_per_sweep"] * q["seconds_per_sweep_factor"]
    assert result["seconds_per_sweep"] <= sps_ceiling, (
        f"per-sweep time regressed: {result['seconds_per_sweep']:.4f}s > "
        f"{sps_ceiling:.4f}s (record {q['seconds_per_sweep']}s x "
        f"{q['seconds_per_sweep_factor']}); stderr:\n{proc.stderr[-1000:]}"
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


def test_serving_throughput():
    """Device-resident ensemble-scoring rows/s through the fused serving
    kernel (ops/pallas_score.py, round 5): >= 0.7x the record.  Guards
    the serving hot path — a silent fall-through to the jnp scorer is an
    ~11x cliff (4.9M vs 56M rows/s measured)."""
    result, stderr = _run_bench("serving_s10_k10")
    assert "serving scorer: pallas kernel" in stderr, (
        f"serving did not dispatch the fused kernel:\n{stderr[-1000:]}"
    )
    _assert_floor(result["value"], "serving_s10_k10", stderr)


def test_wide_large_g_throughput():
    """S=50 x G=10000 (grouped bd-plan, round 4): the wide-S large-G band
    previously fell to the jnp path (~5M upd/s); the restart-grouped
    bd-plan runs it at 172M.  >= 0.7x of the record guards both the
    grouped wrapper and the G-crossover preference."""
    result, stderr = _run_bench("bd_plan_wide_s50_g10k", timeout=1800)
    assert "large-G plan" in stderr, (
        f"G=10k/S=50 did not dispatch to a plan path:\n{stderr[-1000:]}"
    )
    _assert_floor(result["value"], "bd_plan_wide_s50_g10k", stderr)
