"""Checkpoint / resume (SURVEY.md §6).

The reference's only persistence is a per-sample text dump of theta, p and
the likelihood trace via ``to_file()`` — write-only, no resume.  Here:

- ``save_checkpoint``/``load_checkpoint``: .npz of the full restart-stacked
  state, sweep index, likelihood trace, PRNG key, and the serialized Config
  — tiny (<1 MB at K=10), so per-sweep checkpointing is viable.  Atomic
  write (tmp + rename) so a crash never leaves a torn file.
- ``write_text_dump``: reference-style human-readable text outputs (theta
  matrix, p tensor, likelihood trace) per sample, for workflow parity with
  the reference's output format (SURVEY.md §2 "Output writer").
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from trigenicinteractionpredictor_tpu.models.mmsbm import ModelState


def save_checkpoint(
    path: str,
    states: ModelState,
    sweep: int,
    ll_trace: np.ndarray,
    key: Optional[np.ndarray] = None,
    config_json: Optional[str] = None,
    extra: Optional[Dict[str, np.ndarray]] = None,
) -> None:
    """``extra``: additional named arrays a training mode needs to resume
    exactly (e.g. the stepwise EMA statistics carry + update counter).
    Stored under ``extra_``-prefixed keys so the base format is unchanged
    and old checkpoints stay loadable."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    np.savez(
        tmp,
        theta=np.asarray(states.theta),
        p=np.asarray(states.p),
        sweep=np.int64(sweep),
        ll_trace=np.asarray(ll_trace, dtype=np.float64),
        key=np.asarray(key) if key is not None else np.zeros(0, dtype=np.uint32),
        config_json=np.bytes_((config_json or "").encode()),
        **{f"extra_{k}": np.asarray(v) for k, v in (extra or {}).items()},
    )
    # np.savez appends .npz to the filename it opens.
    os.replace(tmp + ".npz", path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with np.load(path, allow_pickle=False) as z:
        cfg = bytes(z["config_json"]).decode() or None
        return {
            "states": ModelState(theta=z["theta"], p=z["p"]),
            "sweep": int(z["sweep"]),
            "ll_trace": z["ll_trace"],
            "key": z["key"] if z["key"].size else None,
            "config_json": cfg,
            "extra": {
                k[len("extra_"):]: z[k]
                for k in z.files
                if k.startswith("extra_")
            },
        }


def write_text_dump(
    out_dir: str,
    states: ModelState,
    ll_trace: np.ndarray,
    gene_names=None,
) -> None:
    """Reference-style per-sample text outputs.

    Layout per sample s: ``theta_s{S}.txt`` (one gene per line: name then K
    memberships), ``p_s{S}.txt`` (one line per group tuple — (k,l,m) for the
    trigenic family, (k,l) for the digenic family — indices then R
    probabilities), and a shared ``likelihood.txt`` trace.
    """
    os.makedirs(out_dir, exist_ok=True)
    theta = np.asarray(states.theta)
    p = np.asarray(states.p)
    if theta.ndim == 2:  # single sample -> add the sample axis
        theta, p = theta[None], p[None]
    S, G, K = theta.shape
    for s in range(S):
        with open(os.path.join(out_dir, f"theta_s{s}.txt"), "w") as fh:
            for g in range(G):
                name = gene_names[g] if gene_names else str(g)
                fh.write(name + "\t" + "\t".join(f"{v:.8f}" for v in theta[s, g]) + "\n")
        with open(os.path.join(out_dir, f"p_s{s}.txt"), "w") as fh:
            for cell in np.ndindex(p.shape[1:-1]):
                probs = "\t".join(f"{v:.8f}" for v in p[(s, *cell)])
                idx = "\t".join(str(i) for i in cell)
                fh.write(f"{idx}\t{probs}\n")
    with open(os.path.join(out_dir, "likelihood.txt"), "w") as fh:
        for row in np.atleast_2d(np.asarray(ll_trace, dtype=np.float64)):
            fh.write("\t".join(f"{v:.6f}" for v in np.atleast_1d(row)) + "\n")
