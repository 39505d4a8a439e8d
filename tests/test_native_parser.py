"""Native C++ parser vs Python parser: identical rows on the same input."""

import os

import numpy as np
import pytest

from trigenicinteractionpredictor_tpu.config import DataConfig
from trigenicinteractionpredictor_tpu.data.kuzmin import parse_kuzmin_rows
from trigenicinteractionpredictor_tpu.data.synthetic import write_kuzmin_like_tsv
from trigenicinteractionpredictor_tpu.native import binding


pytestmark = pytest.mark.skipif(
    not binding.available(), reason="native library unavailable (no g++?)"
)


def _python_rows(path, cfg):
    with open(path, newline="") as fh:
        return parse_kuzmin_rows(fh, cfg)


@pytest.mark.parametrize(
    "cfg",
    [
        DataConfig(),
        DataConfig(tau_mode="negative"),
        DataConfig(p_cutoff=0.01, tau_cutoff=0.2),
        DataConfig(strip_allele_suffix=False),
        DataConfig(deduplicate=True),
    ],
    ids=["default", "negative", "tight", "no-strip", "dedup"],
)
def test_native_matches_python(tmp_path, cfg):
    path = str(tmp_path / "k.tsv")
    write_kuzmin_like_tsv(path, n_rows=500, n_genes=40, seed=2)
    py = _python_rows(path, cfg)
    nat = binding.parse_kuzmin_file(path, cfg)
    assert nat == py


def test_native_missing_columns(tmp_path):
    path = str(tmp_path / "bad.tsv")
    with open(path, "w") as fh:
        fh.write("foo\tbar\n1\t2\n")
    with pytest.raises(ValueError, match="missing required columns"):
        binding.parse_kuzmin_file(path, DataConfig())


def test_native_empty_file(tmp_path):
    path = str(tmp_path / "empty.tsv")
    open(path, "w").close()
    assert binding.parse_kuzmin_file(path, DataConfig()) == []


def test_loader_uses_native_transparently(tmp_path):
    from trigenicinteractionpredictor_tpu.data.kuzmin import load_kuzmin_tsv

    path = str(tmp_path / "k.tsv")
    write_kuzmin_like_tsv(path, n_rows=300, n_genes=30, seed=5)
    ds = load_kuzmin_tsv(path)
    py = _python_rows(path, DataConfig())
    assert ds.n_rows == len(py)
    np.testing.assert_array_equal(
        ds.ratings, np.array([r for *_, r in py], dtype=np.int32)
    )
