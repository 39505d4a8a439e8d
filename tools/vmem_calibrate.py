"""Regenerate the on-chip VMEM calibration table by measurement.

VERDICT r3 item 5: the dispatch envelopes are hand-calibrated constants
that nothing regenerates when the Mosaic/axon stack changes.  This tool
closes the loop for every kernel family with a calibration hook
(ops/calibration.py: 'bdr', 'bdrg', 'bd-plan'):

1. ``emit``  — write a self-contained probe-job script into a
   tools/tpu_worker.py queue.  The job compile+runs each (G, K, S, g,
   tile) shape through the PRODUCTION chained step (the same definition
   of "good" the table documents), alarm-guarded so a wedged remote
   compile cannot hang the worker, and appends one JSON line per probe
   to a results file.
2. ``merge`` — fold a results file into
   trigenicinteractionpredictor_tpu/ops/vmem_calibration.json via
   ops.calibration.record (good AND bad shapes are both recorded; bad
   entries are what veto analytic-envelope traps like t256/K20/g2).

Usage (TPU host):
    python tools/tpu_worker.py /tmp/tpu_jobs &
    python tools/vmem_calibrate.py emit --family bdr \
        --queue /tmp/tpu_jobs/queue --results /tmp/cal_bdr.jsonl
    # ... wait for the worker ...
    python tools/vmem_calibrate.py merge /tmp/cal_bdr.jsonl

The default grids cover the production bands (K 10..64, S 10..100, the
dispatch group rule's picks plus one step either side, tiles 512..64).
Pass --shapes to probe an explicit list instead:
    --shapes 1000,25,10,5,256 1000,25,10,2,128
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

JOB_TEMPLATE = '''"""Auto-generated VMEM calibration probes ({family})."""
import json, sys
sys.modules.pop("probe_lib", None)
sys.path.insert(0, {tools_dir!r})
import probe_lib
import functools

FAMILY = {family!r}
SHAPES = {shapes!r}
RESULTS = {results!r}


def factory(tile, group):
    if FAMILY == "bdr":
        from trigenicinteractionpredictor_tpu.ops.pallas_em_bdr import (
            bdr_em_ensemble_stats,
        )
        fn = functools.partial(bdr_em_ensemble_stats, tile_b=tile, group=group)
    elif FAMILY == "bdrg":
        from trigenicinteractionpredictor_tpu.ops.pallas_em_bdrg import (
            bdrg_em_ensemble_stats,
        )
        fn = functools.partial(bdrg_em_ensemble_stats, tile_b=tile, group=group)
    else:
        raise ValueError(FAMILY)
    fn.ensemble = True
    return fn


with open(RESULTS, "a", buffering=1) as out:
    for (G, K, S, g, tile) in SHAPES:
        if FAMILY == "bd-plan":
            rec = probe_lib.probe_bd_plan(
                131072, G, K, S, tile, alarm=420, sweeps=20, reps=1
            )
        else:
            rec = probe_lib.probe_bdr(
                131072, G, K, S, tile, g, alarm=420, sweeps=20, reps=1,
                stats_fn_factory=None if FAMILY == "bdr" else factory,
            )
        rec["family"] = FAMILY
        line = json.dumps(rec)
        print(line, flush=True)
        out.write(line + chr(10))
        if not rec.get("ok") and rec.get("error") == "timeout":
            print("timeout - aborting remaining probes", flush=True)
            break
'''


def default_grid(family: str):
    """(G, K, S, g, tile) shapes for the production bands."""
    from trigenicinteractionpredictor_tpu.ops.dispatch import _pick_bdr_group

    shapes = []
    if family in ("bdr", "bdrg"):
        for k in (10, 16, 20, 25):
            for s in (10, 20, 50):
                g0 = _pick_bdr_group(s, k) if family == "bdr" else 1
                gs = {g0}
                for cand in (g0 // 2, g0 * 2):
                    if cand >= 1 and s % cand == 0:
                        gs.add(cand)
                for g in sorted(gs):
                    for tile in (512, 256, 128):
                        shapes.append((1000, k, s, g, tile))
    else:  # bd-plan: group == S by construction
        for k in (10, 16, 20):
            for s in (10, 20):
                for tile in (512, 256, 128):
                    shapes.append((100_000, k, s, s, tile))
    return shapes


def cmd_emit(args) -> int:
    if args.shapes:
        shapes = [tuple(int(x) for x in s.split(",")) for s in args.shapes]
    else:
        shapes = default_grid(args.family)
    job = JOB_TEMPLATE.format(
        family=args.family,
        shapes=shapes,
        results=os.path.abspath(args.results),
        tools_dir=os.path.dirname(os.path.abspath(__file__)),
    )
    name = f"cal_{args.family.replace('-', '_')}.py"
    path = os.path.join(args.queue, name)
    with open(path, "w") as fh:
        fh.write(job)
    print(f"queued {len(shapes)} probes -> {path}; results -> {args.results}")
    return 0


def cmd_merge(args) -> int:
    from trigenicinteractionpredictor_tpu.ops import calibration

    n_good = n_bad = n_skip = 0
    with open(args.results) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            fam = rec.get("family")
            if fam is None:
                continue
            shape = (rec["G"], rec["K"], rec["S"],
                     rec.get("group", rec["S"]), rec["tile"])
            if rec.get("ok"):
                # GOOD entries carry the probe N (round 5): compile
                # success is N-dependent (grid-count x body-size
                # ceiling), so a good probe proves only n <= probe N.
                calibration.record(
                    fam,
                    (*shape, rec.get("n", calibration.LEGACY_PROBE_N)),
                    True,
                )
                n_good += 1
            elif rec.get("error") in ("JaxRuntimeError", "XlaRuntimeError"):
                # compile/VMEM rejection on real hardware -> bad entry
                # (kept N-independent: see ops/calibration.py docstring)
                calibration.record(fam, shape, False)
                n_bad += 1
            else:
                n_skip += 1  # timeouts/other: record nothing
    print(
        f"merged into {calibration.calibration_path()}: "
        f"{n_good} good, {n_bad} bad, {n_skip} skipped"
    )
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    p_e = sub.add_parser("emit", help="write a probe job to a worker queue")
    p_e.add_argument("--family", choices=["bdr", "bdrg", "bd-plan"],
                     required=True)
    p_e.add_argument("--queue", default="/tmp/tpu_jobs/queue")
    p_e.add_argument("--results", default="/tmp/vmem_cal_results.jsonl")
    p_e.add_argument("--shapes", nargs="*", default=None,
                     help="explicit G,K,S,g,tile tuples")
    p_e.set_defaults(fn=cmd_emit)
    p_m = sub.add_parser("merge", help="fold a results file into the table")
    p_m.add_argument("results")
    p_m.set_defaults(fn=cmd_merge)
    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
