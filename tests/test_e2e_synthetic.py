"""End-to-end convergence tests (SURVEY.md §5.5, BASELINE config 1).

Synthetic data from a known (theta*, p*): the fitted engine must approach
the Bayes AUC of the generating model and beat a degree-baseline predictor.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trigenicinteractionpredictor_tpu.config import Config, MeshConfig, TrainConfig
from trigenicinteractionpredictor_tpu.data.splits import train_test_split
from trigenicinteractionpredictor_tpu.data.synthetic import sample_synthetic_dataset
from trigenicinteractionpredictor_tpu.eval import evaluate
from trigenicinteractionpredictor_tpu.models.mmsbm import ModelState
from trigenicinteractionpredictor_tpu.ops.metrics import auc
from trigenicinteractionpredictor_tpu.ops.scoring import predict_interaction
from trigenicinteractionpredictor_tpu.train.trainer import fit


@pytest.fixture(scope="module")
def fitted():
    ds, theta_star, p_star = sample_synthetic_dataset(
        4000, n_genes=50, k=4, n_ratings=2, alpha_theta=0.2, alpha_p=0.2, seed=7
    )
    train, test = train_test_split(ds, 0.2, seed=0)
    cfg = Config(
        train=TrainConfig(k=4, sweeps=500, samples=8, likelihood_freq=50, seed=0),
        mesh=MeshConfig(data=4, ensemble=2),
    )
    result = fit(cfg, train)
    return ds, theta_star, p_star, train, test, result


def test_recovers_near_bayes_auc(fitted):
    ds, theta_star, p_star, train, test, result = fitted
    gt = ModelState(
        theta=jnp.asarray(theta_star, jnp.float32),
        p=jnp.asarray(p_star, jnp.float32),
    )
    bayes = float(
        auc(
            predict_interaction(gt, jnp.asarray(test.triplets)),
            jnp.asarray(test.ratings),
        )
    )
    report = evaluate(result.states, test, result.final_loglik)
    # Within 0.03 of the generating model's own AUC.
    assert report.auc > bayes - 0.03, (report.auc, bayes)
    assert report.best_sample_auc > bayes - 0.04


def test_beats_degree_baseline(fitted):
    ds, _, _, train, test, result = fitted
    # Degree baseline: score a triplet by the mean positive-rate of its
    # genes in the training split.
    G = ds.n_genes
    pos = np.zeros(G)
    tot = np.zeros(G)
    for (i, j, e), r in zip(train.triplets, train.ratings):
        for g in (i, j, e):
            pos[g] += r
            tot[g] += 1
    rate = pos / np.maximum(tot, 1)
    base_scores = rate[test.triplets].mean(axis=1)
    base_auc = float(auc(jnp.asarray(base_scores), jnp.asarray(test.ratings)))
    report = evaluate(result.states, test, result.final_loglik)
    assert report.auc > base_auc + 0.02, (report.auc, base_auc)


def test_restart_ll_correlates_with_auc(fitted):
    """Model selection by training L is meaningful: the best-L restart must
    not be among the worst by test AUC (SURVEY.md §1.2 sampling protocol)."""
    ds, _, _, train, test, result = fitted
    aucs = []
    for s in range(result.final_loglik.shape[0]):
        st = ModelState(
            theta=jnp.asarray(np.asarray(result.states.theta)[s]),
            p=jnp.asarray(np.asarray(result.states.p)[s]),
        )
        aucs.append(
            float(
                auc(
                    predict_interaction(st, jnp.asarray(test.triplets)),
                    jnp.asarray(test.ratings),
                )
            )
        )
    best = result.best_sample
    assert aucs[best] >= np.median(aucs) - 0.02


def test_heldout_loglik_reported(fitted):
    """EvalReport carries held-out log-likelihood (BASELINE config 3)."""
    ds, _, _, train, test, result = fitted
    report = evaluate(result.states, test, result.final_loglik)
    assert report.heldout_loglik < 0 and np.isfinite(report.heldout_loglik)
    assert report.heldout_loglik_mean < 0
    # Best-sample held-out L should not be much worse than the ensemble mean.
    assert report.heldout_loglik >= report.heldout_loglik_mean - abs(
        report.heldout_loglik_mean
    ) * 0.1
    d = report.to_dict()
    assert "heldout_loglik" in d and "heldout_loglik_mean" in d
