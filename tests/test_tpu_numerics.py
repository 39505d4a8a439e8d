"""On-chip strict-numerics gate (VERDICT r3 item 4).

The monotone-likelihood EM invariant (SURVEY.md §1.2) holds exactly in
f32 on the CPU suite (tests/test_invariants.py) but is measurably
violated on the MXU's DEFAULT precision (drops to -41 nats at |L| ~ 9e4,
BASELINE.md numerics note).  EngineConfig.precision='strict' must buy it
back on real hardware: this test runs tools/numerics_check.py in a
subprocess with the axon environment intact and asserts the strict-mode
trace is monotone to within f32 reduction noise, while fast mode keeps
its measured (bounded) envelope.

Self-skips off-TPU, like the perf gate.
"""

import json
import os
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

_TPU_ENV = {
    **os.environ,
    "PYTHONPATH": f"{REPO}:/root/.axon_site",
}
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

# Pairwise f32 summation over ~131k rows at |L| ~ 9e4 wobbles the trace by
# O(0.1) nats even with exact matmuls; 1 nat is an order of magnitude of
# headroom above that and two orders below fast mode's measured envelope.
STRICT_TOL_NATS = 1.0
# Fast mode's measured on-chip envelope was -41 nats (round 3); gate it at
# 3x so a real numerics regression (not noise) still fails.
FAST_ENVELOPE_NATS = 150.0


def test_strict_mode_is_monotone_on_chip():
    out = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "tools", "numerics_check.py"),
            "--sweeps", "60",
        ],
        env=_TPU_ENV, capture_output=True, text=True, timeout=2700,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    recs = {
        r["mode"]: r
        for r in (json.loads(l) for l in out.stdout.splitlines() if l.strip())
    }
    assert set(recs) == {"fast", "strict"}, recs
    strict = recs["strict"]
    fast = recs["fast"]
    assert strict["worst_delta_nats"] > -STRICT_TOL_NATS, (
        f"strict mode violated monotonicity by {strict['worst_delta_nats']}"
        f" nats (kernel {strict['kernel']})"
    )
    assert fast["worst_delta_nats"] > -FAST_ENVELOPE_NATS, (
        f"fast mode's violation envelope regressed: {fast['worst_delta_nats']}"
    )
    # strict costs throughput: measured 5.4x at the headline shape
    # (HIGHEST = 6-pass bf16 on EVERY matmul; the 3-pass HIGH mode is
    # unsupported by the axon Mosaic — "Unsupported dot precision: HIGH",
    # probed 2026-08-20).  Gate at 8x so a compounding regression fails.
    assert strict["upd_per_s"] > fast["upd_per_s"] / 8.0, (fast, strict)
