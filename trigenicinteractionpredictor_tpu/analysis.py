"""Cross-restart results analysis (reference layer L5, SURVEY.md §3.1
"Evaluation / AUC ... averages over samples ... comparison stats").

The reference ships separate analysis helper scripts that load the
per-sample text dumps and compare restarts (SURVEY.md §4.4 [recall:low]).
Here the same questions are first-class, computed from the restart-stacked
checkpoint in a few device calls:

- *Do independent restarts agree on the ranking?*  Pairwise Pearson
  correlation between per-restart score vectors on a probe set.
- *Did restarts find the same blocks?*  MMSBM groups are identifiable only
  up to permutation, so theta matrices are compared after greedy column
  alignment.
- *Which restart should I trust?*  Per-restart training likelihood and
  (when labels are available) held-out AUC, side by side.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from trigenicinteractionpredictor_tpu.models.mmsbm import ModelState
from trigenicinteractionpredictor_tpu.ops.metrics import auc
from trigenicinteractionpredictor_tpu.ops.scoring import predict_interaction


def restart_score_agreement(
    states: ModelState, tuples: jax.Array, interact_rating: int = 1
) -> dict:
    """Pairwise Pearson correlation of per-restart interaction scores.

    Returns the full S x S matrix plus the mean off-diagonal correlation —
    a scalar consistency index for the ensemble (1.0 = every restart ranks
    the probe set identically).
    """
    from trigenicinteractionpredictor_tpu.ops.em import map_restarts

    scores = np.asarray(
        map_restarts(
            lambda st: predict_interaction(st, tuples, interact_rating), states
        ),
        dtype=np.float64,
    )  # [S, B]
    S = scores.shape[0]
    corr = np.corrcoef(scores) if S > 1 else np.ones((1, 1))
    # A restart with constant scores (collapsed theta, K=1) has undefined
    # correlation; report it as 0 agreement instead of poisoning the whole
    # report with NaN.
    corr = np.nan_to_num(corr, nan=0.0)
    off = corr[~np.eye(S, dtype=bool)]
    return {
        "corr_matrix": corr.tolist(),
        "mean_pairwise_corr": float(off.mean()) if off.size else 1.0,
        "min_pairwise_corr": float(off.min()) if off.size else 1.0,
    }


def align_groups(theta_a: np.ndarray, theta_b: np.ndarray) -> dict:
    """Greedy-match restart B's groups onto restart A's by column cosine.

    Returns the permutation applied to B's columns and the mean cosine of
    the matched pairs (1.0 = identical block structure up to relabeling).
    """
    a = np.asarray(theta_a, dtype=np.float64)
    b = np.asarray(theta_b, dtype=np.float64)
    an = a / (np.linalg.norm(a, axis=0, keepdims=True) + 1e-12)
    bn = b / (np.linalg.norm(b, axis=0, keepdims=True) + 1e-12)
    sim = an.T @ bn  # [K, K]
    K = sim.shape[0]
    perm = np.full(K, -1, dtype=int)
    matched = []
    remaining = sim.copy()
    for _ in range(K):
        i, j = np.unravel_index(np.argmax(remaining), remaining.shape)
        perm[i] = j
        matched.append(float(remaining[i, j]))
        remaining[i, :] = -np.inf
        remaining[:, j] = -np.inf
    return {
        "permutation": perm.tolist(),
        "mean_matched_cosine": float(np.mean(matched)),
        "min_matched_cosine": float(np.min(matched)),
    }


def group_stability(states: ModelState) -> dict:
    """Align every restart's groups onto restart 0's and summarize.

    Low cosines mean restarts landed in different EM basins — a signal to
    raise S or sweeps (the reference's implicit 'stability across samples'
    check, SURVEY.md §5)."""
    theta = np.asarray(states.theta)
    if theta.ndim == 2:
        theta = theta[None]
    S = theta.shape[0]
    aligns = [align_groups(theta[0], theta[s]) for s in range(1, S)]
    cosines = [a["mean_matched_cosine"] for a in aligns] or [1.0]
    return {
        "vs_restart0": aligns,
        "mean_alignment": float(np.mean(cosines)),
        "min_alignment": float(np.min(cosines)),
    }


def analyze_checkpoint(
    checkpoint_path: str,
    tuples: Optional[np.ndarray] = None,
    labels: Optional[np.ndarray] = None,
    interact_rating: int = 1,
) -> dict:
    """Full cross-restart report from a restart-stacked checkpoint.

    ``tuples``/``labels`` (e.g. a held-out split) enable score-agreement
    and per-restart AUC sections; without them the report covers parameter
    stability and the stored likelihood trace only.
    """
    from trigenicinteractionpredictor_tpu.train.checkpoint import load_checkpoint

    ck = load_checkpoint(checkpoint_path)
    states_np = ck["states"]
    theta = np.asarray(states_np.theta)
    if theta.ndim == 2:
        states_np = ModelState(
            theta=theta[None], p=np.asarray(states_np.p)[None]
        )
    states = ModelState(
        theta=jnp.asarray(states_np.theta), p=jnp.asarray(states_np.p)
    )
    S = states.theta.shape[0]

    ll_trace = np.asarray(ck["ll_trace"], dtype=np.float64)
    report: dict = {
        "checkpoint": os.path.abspath(checkpoint_path),
        "n_samples": int(S),
        "sweep": int(ck["sweep"]),
        "group_stability": group_stability(states),
    }
    if ll_trace.size:
        final = ll_trace[-1]
        report["final_loglik_per_sample"] = [float(x) for x in final]
        report["best_sample"] = int(np.argmax(final))
        report["loglik_spread"] = float(final.max() - final.min())

    if tuples is not None:
        tuples_j = jnp.asarray(np.asarray(tuples, dtype=np.int32))
        report["score_agreement"] = restart_score_agreement(
            states, tuples_j, interact_rating
        )
        if labels is not None:
            # ``labels`` arrives as raw rating classes (cmd_analyze feeds
            # ds.ratings); binarize against the interaction class exactly
            # like eval.py — raw indices would corrupt AUC at n_ratings > 2.
            labels_j = jnp.asarray(
                (np.asarray(labels) == interact_rating).astype(np.int32)
            )
            per_auc = [
                float(
                    auc(
                        predict_interaction(
                            ModelState(
                                theta=states.theta[s], p=states.p[s]
                            ),
                            tuples_j,
                            interact_rating,
                        ),
                        labels_j,
                    )
                )
                for s in range(S)
            ]
            report["per_sample_auc"] = per_auc
            report["auc_spread"] = float(max(per_auc) - min(per_auc))
    return report


def write_analysis(report: dict, out_path: str) -> None:
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=2)
