"""Held-out evaluation (reference layer L5, SURVEY.md §4.4).

The reference evaluates in a separate pass over dumped text files: score
each held-out triplet from each sample's (theta, p), average the interaction
probability across samples, rank, compute AUC.  Here the whole pass is a few
jitted device calls on the packed test split.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from trigenicinteractionpredictor_tpu.data.packing import TripletDataset
from trigenicinteractionpredictor_tpu.models.mmsbm import ModelState
from trigenicinteractionpredictor_tpu.ops.em import (
    Batch,
    log_likelihood,
    map_restarts,
)
from trigenicinteractionpredictor_tpu.ops.metrics import auc, average_precision
from trigenicinteractionpredictor_tpu.ops.scoring import (
    ensemble_predict_interaction,
    predict_interaction,
)


@dataclass
class EvalReport:
    auc: float
    average_precision: float
    best_sample_auc: float
    heldout_loglik: float         # test-set log-likelihood of the best sample
    heldout_loglik_mean: float    # mean over the restart ensemble
    n_test: int
    n_pos: int

    def to_dict(self) -> dict:
        return {
            "auc": self.auc,
            "average_precision": self.average_precision,
            "best_sample_auc": self.best_sample_auc,
            "heldout_loglik": self.heldout_loglik,
            "heldout_loglik_mean": self.heldout_loglik_mean,
            "n_test": self.n_test,
            "n_pos": self.n_pos,
        }


def evaluate(
    states: ModelState,
    test_ds: TripletDataset,
    final_loglik: Optional[np.ndarray] = None,
    interact_rating: int = 1,
) -> EvalReport:
    """Score a restart-stacked state ensemble on a held-out split.

    - ensemble score: mean P(interact) over samples (the reference's
      sampling protocol, SURVEY.md §1.2);
    - best-sample score: the single restart with the highest final training
      likelihood (the reference's model-selection rule, BASELINE config 4) —
      requires ``final_loglik``.
    """
    trips = jnp.asarray(test_ds.triplets)
    ratings = jnp.asarray(test_ds.ratings)
    weights = jnp.asarray(test_ds.weights)
    # Binary labels for ranking metrics: rating == the interaction class.
    # Raw rating indices would corrupt AUC/AP whenever n_ratings > 2.
    labels = (ratings == interact_rating).astype(jnp.int32)
    states_j = ModelState(
        theta=jnp.asarray(states.theta), p=jnp.asarray(states.p)
    )

    ens_scores = ensemble_predict_interaction(states_j, trips, interact_rating)
    ens_auc = float(auc(ens_scores, labels, weights))
    ens_ap = float(average_precision(ens_scores, labels, weights))

    # Held-out log-likelihood per sample (BASELINE config 3 reports this)
    # uses the RAW rating classes, not the binarized labels.
    # map_restarts + row_chunk: large-K graphs crash/overflow when vmapped
    # or fused whole (ops/em.py SERIAL_RESTART_K).
    test_batch = Batch(triplets=trips, ratings=ratings, weights=weights)
    heldout_ll = np.asarray(
        map_restarts(
            lambda st: log_likelihood(st, test_batch, row_chunk=16384), states_j
        ),
        dtype=np.float64,
    )

    if final_loglik is not None:
        best = int(np.argmax(final_loglik))
    else:
        best = int(np.argmax(heldout_ll))
    best_state = ModelState(theta=states_j.theta[best], p=states_j.p[best])
    best_scores = predict_interaction(best_state, trips, interact_rating)
    best_auc = float(auc(best_scores, labels, weights))

    real = np.asarray(test_ds.weights) > 0
    return EvalReport(
        auc=ens_auc,
        average_precision=ens_ap,
        best_sample_auc=best_auc,
        heldout_loglik=float(heldout_ll[best]),
        heldout_loglik_mean=float(heldout_ll.mean()),
        n_test=int(real.sum()),
        n_pos=int((np.asarray(test_ds.ratings)[real] == interact_rating).sum()),
    )
