"""The checked-in example dataset loads and trains end-to-end (quickstart)."""

import os

from trigenicinteractionpredictor_tpu.config import Config, MeshConfig, TrainConfig
from trigenicinteractionpredictor_tpu.data.kuzmin import load_kuzmin_tsv
from trigenicinteractionpredictor_tpu.data.splits import train_test_split
from trigenicinteractionpredictor_tpu.eval import evaluate
from trigenicinteractionpredictor_tpu.train.trainer import fit

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLE = os.path.join(REPO, "datasets", "example_trigenic.tsv")


def test_example_dataset_loads():
    ds = load_kuzmin_tsv(EXAMPLE)
    assert ds.n_rows > 500          # ~80% of 1000 rows are trigenic
    assert ds.n_genes <= 80
    assert int(ds.ratings.sum()) == 112  # seed-42 positives, pinned


def test_example_dataset_quickstart_fit(tmp_path):
    ds = load_kuzmin_tsv(EXAMPLE)
    train, test = train_test_split(ds, 0.2, seed=0)
    cfg = Config(
        train=TrainConfig(k=2, sweeps=30, samples=2, likelihood_freq=10),
        mesh=MeshConfig(data=2, ensemble=1),
        out_dir=str(tmp_path),
    )
    result = fit(cfg, train)
    report = evaluate(result.states, test, result.final_loglik)
    assert 0.0 <= report.auc <= 1.0
