"""Roofline accounting for the EM sweep kernels (VERDICT r2 item 7).

Joins the per-shape analytic cost models of the three Pallas paths with
measured throughput (tools/kernel_race.py JSONL, or a single number passed
on the command line) and prints the BASELINE.md roofline table: useful EM
FLOPs per restart-update, achieved useful TFLOP/s, total TFLOP/s including
one-hot/scatter overhead, HBM bytes moved per restart-update, and which
peak (MXU vs HBM) bounds each path at each shape.

Peaks are nominal TPU v5e (the axon device reports "TPU v5 lite"):
MXU ~197 TFLOP/s with bf16 operand passes (f32 operands at DEFAULT
precision are truncated to bf16 on the MXU — BASELINE.md's negative
result on explicit bf16 casts), HBM ~819 GB/s.  The point of the table is
not the absolute percentages but the *attribution*: which term dominates
each path's time and therefore what an optimization must remove.

Usage:
    python tools/roofline.py --from-jsonl /tmp/race1.jsonl
    python tools/roofline.py --path onehot --g 1000 --k 10 --s 10 \
        --updates-per-sec 167e6
"""

from __future__ import annotations

import argparse
import json
import sys

MXU_PEAK = 197e12      # bf16-pass FLOP/s, nominal v5e
HBM_PEAK = 819e9       # bytes/s, nominal v5e
R_DEFAULT = 2


def em_useful_flops(k: int, r: int) -> int:
    """Factorized-algebra FLOPs per restart-triplet (the model math that any
    implementation of SURVEY.md §8.3 must do; everything else is overhead).

    Matmul terms (2 FLOPs per MAC): T_all 2RK^3, spreads 2x 2K^3,
    A1/A2 2x 2K^3, A3_all 2RK^3, p-stat outer product 2RK^3; plus O(K^2)
    elementwise (masks, D, scale, s-streams) counted at 8K^2.
    """
    return (8 + 6 * r) * k**3 + 8 * k**2


def path_overhead_flops(path: str, g: int, k: int, s: int, wb: int | None) -> float:
    """Non-EM MXU FLOPs per restart-update (per data row, divided by S
    where the work is shared across the lane-stacked ensemble)."""
    sk = s * k
    if path == "onehot":
        # 3 gather + 3 scatter one-hot matmuls, [Bt, G] x [G, S*K], shared
        # across the ensemble -> per restart-update: 12 G K.
        return 12.0 * g * k
    if path == "hybrid":
        # scatter trio only.
        return 6.0 * g * k
    if path == "plan":
        # sorted-stream scatter: ~3 value rows per data row (padding adds a
        # few %), one [Bt, wb] one-hot matmul each -> 6 wb K per update.
        return 6.0 * (wb or 512) * k
    if path == "bdr":
        # One-hot gather/scatter shared across the ensemble (6 matmuls x
        # 2*G*SK per row / S updates = 12 G K per restart-update) + the
        # block-diagonal overcompute, now at the sub-group width gr
        # (ops/dispatch._pick_bdr_group; gr == S pre-restack): the six
        # gK2-wide stages cost 12*gr*K^3 per restart-update and the
        # per-group cross 2*gr*K^3 — group-fold, not S-fold, overcompute.
        gr = _pick_group(s, k)
        return 12.0 * g * k + 14.0 * gr * k**3
    if path == "bd-plan":
        # No G-sized matmuls; the block-diagonal stages run at FULL
        # ensemble width (group == S: the bd kernel has no sub-grouping),
        # so overcompute is 14*S*K^3 per restart-update, plus the sorted-
        # stream scatter's 6 wb K (same as the plan path).
        return 14.0 * s * k**3 + 6.0 * (wb or 512) * k
    if path == "bdg":
        # bd-plan's stages + position-1's fused block-local gather AND
        # scatter (2 x 2*wb1*SK per row / S) replacing a third of the
        # scatter stream; wb defaults to the g1 block width 512.
        return 14.0 * s * k**3 + 4.0 * (wb or 512) * k + 4.0 * 512 * k / s
    raise ValueError(path)


def _pick_group(s: int, k: int) -> int:
    try:
        sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
        from trigenicinteractionpredictor_tpu.ops.dispatch import (
            _pick_bdr_group,
        )

        return _pick_bdr_group(s, k)
    except Exception:
        return s


def path_hbm_bytes(path: str, g: int, k: int, s: int, wb: int | None) -> float:
    """HBM bytes per restart-update (per data row / S).  theta, p and the
    stats accumulators are VMEM-resident or tiny; the big streams are the
    pre-gathered/marginal [B, S*K] f32 arrays where they exist."""
    sk = s * k
    row_in = (3 + 1 + 1) * 4 / s          # trip + rating + weight
    if path in ("onehot", "bdr"):
        return row_in
    if path == "hybrid":
        # XLA gather writes th1..3 [B, SK]; kernel reads them back.
        return row_in + 2 * 3 * sk * 4 / s
    if path in ("plan", "bd-plan"):
        # th gather (w+r) + s-stream write + perm-gather (r+w) + scatter read.
        return row_in + (2 * 3 + 3 + 3 * 2 + 3) * sk * 4 / s
    if path == "bdg":
        # Position 1 rides VMEM blocks (round 5): 2 of 3 th gathers, 2 of
        # 3 s-streams, 2B of 3B perm-gather + scatter slots.
        return row_in + (2 * 2 + 2 + 2 * 2 + 2) * sk * 4 / s
    raise ValueError(path)


def analyze(rec: dict) -> dict:
    path, g, k, s = rec["path"], rec["g"], rec["k"], rec["s"]
    r = rec.get("r", R_DEFAULT)
    wb = rec.get("wb")
    ups = rec["updates_per_sec"]
    useful = em_useful_flops(k, r)
    over = path_overhead_flops(path, g, k, s, wb)
    bytes_ = path_hbm_bytes(path, g, k, s, wb)
    total_tf = ups * (useful + over) / 1e12
    useful_tf = ups * useful / 1e12
    hbm_gbs = ups * bytes_ / 1e9
    mxu_frac = total_tf * 1e12 / MXU_PEAK
    hbm_frac = hbm_gbs * 1e9 / HBM_PEAK
    return {
        **{kk: rec[kk] for kk in ("path", "g", "k", "s")},
        "wb": wb,
        "updates_per_sec": ups,
        "useful_flops_per_update": useful,
        "overhead_flops_per_update": round(over),
        "overhead_pct": round(100 * over / (useful + over), 1),
        "useful_tflops": round(useful_tf, 3),
        "total_tflops": round(total_tf, 2),
        "hbm_gb_per_s": round(hbm_gbs, 1),
        "mxu_util_pct": round(100 * mxu_frac, 1),
        "hbm_util_pct": round(100 * hbm_frac, 1),
        "bound": "MXU" if mxu_frac > hbm_frac else "HBM"
        if max(mxu_frac, hbm_frac) > 0.25
        else "dispatch/latency",
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--from-jsonl", help="kernel_race.py output file")
    ap.add_argument(
        "--path",
        choices=["onehot", "hybrid", "plan", "bdr", "bd-plan", "bdg"],
    )
    ap.add_argument("--g", type=int)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--s", type=int, default=10)
    ap.add_argument("--wb", type=int)
    ap.add_argument("--updates-per-sec", type=float)
    args = ap.parse_args()

    recs = []
    if args.from_jsonl:
        with open(args.from_jsonl) as f:
            for line in f:
                line = line.strip()
                if line:
                    recs.append(json.loads(line))
    else:
        recs.append(
            {
                "path": args.path,
                "g": args.g,
                "k": args.k,
                "s": args.s,
                "wb": args.wb,
                "updates_per_sec": args.updates_per_sec,
            }
        )

    cols = (
        "path g k s wb updates_per_sec overhead_pct useful_tflops "
        "total_tflops hbm_gb_per_s mxu_util_pct hbm_util_pct bound"
    ).split()
    print("\t".join(cols), file=sys.stderr)
    for rec in recs:
        if not rec.get("updates_per_sec"):
            continue
        a = analyze(rec)
        print(json.dumps(a))
        print(
            "\t".join(str(a[c]) for c in cols),
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
