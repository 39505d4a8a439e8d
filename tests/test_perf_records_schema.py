"""Shape-keying guard for the perf records (VERDICT r4 item 5).

Round 4 shipped a record (``large_k50_s10``) raised from an N=131k
measurement while the gate benched N=32768 — caught by hand (BASELINE.md
gate note, commit 0c19a44).  This CPU-only test makes that divergence
structurally impossible: every record stores both the shape it was
measured at AND the bench args the gate runs, and this test re-derives
the shape from the args (using bench.py's own defaults) and asserts they
agree.  The gate itself reads its arguments from the record
(test_perf_regression._run_bench), so record, gate, and declared shape
can never drift apart independently.
"""

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))
RECORDS = json.load(open(os.path.join(HERE, "perf_records.json")))


def _bench_defaults():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_defaults_probe", os.path.join(os.path.dirname(HERE), "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    # Executing bench.py would claim the TPU; read the constants without
    # running main() — they are module-level assignments before any JAX
    # import happens at module scope?  bench.py imports jax inside main(),
    # so module exec is safe on CPU CI.
    spec.loader.exec_module(mod)
    return {"n": mod.N, "g": mod.G, "k": mod.K, "s": mod.S}


def _shape_from_args(args, defaults):
    shape = dict(defaults)
    flag_map = {
        "-n": "n", "-g": "g", "--genes": "g", "-k": "k",
        "-s": "s", "--samples": "s",
    }
    i = 0
    while i < len(args):
        a = args[i]
        if a in flag_map:
            shape[flag_map[a]] = int(args[i + 1])
            i += 2
        else:
            i += 1
    return shape


def test_throughput_records_shape_matches_args():
    defaults = _bench_defaults()
    for name, rec in RECORDS["records"].items():
        for field in ("value", "n", "g", "k", "s", "args"):
            assert field in rec, f"record {name} missing field {field!r}"
        derived = _shape_from_args(rec["args"], defaults)
        if name == "single_s1_k10":
            # Parsed from the S=10 run's stderr: its own shape is S=1 but
            # it shares the ensemble run's args by construction.
            derived["s"] = 1
        declared = {k: rec[k] for k in ("n", "g", "k", "s")}
        assert derived == declared, (
            f"record {name}: declared shape {declared} != shape the gate "
            f"would bench {derived} (from args {rec['args']}) — re-measure "
            "at the gate shape or fix the args; never let them diverge "
            "(round-4 large_k50_s10 incident)"
        )


def test_quality_records_have_relay_independent_fields():
    for name, q in RECORDS["quality"].items():
        if name == "comment":
            continue
        for field in (
            "sweeps_to_converged", "sweeps_slack",
            "seconds_per_sweep", "seconds_per_sweep_factor",
            "auc_final", "auc_band", "args",
        ):
            assert field in q, f"quality record {name} missing {field!r}"
        assert q["seconds_per_sweep_factor"] <= 3.0, (
            "per-sweep ceiling factor crept up — the point of the round-5 "
            "rework is a TIGHT relay-independent gate (VERDICT r4 weak #1)"
        )


def test_floor_fraction_sane():
    assert 0.5 <= RECORDS["floor_fraction"] <= 1.0
