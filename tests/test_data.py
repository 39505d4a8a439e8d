"""Data layer tests: Kuzmin parser round-trip, packing, splits, synthetic."""

import numpy as np
import pytest

from trigenicinteractionpredictor_tpu.config import DataConfig
from trigenicinteractionpredictor_tpu.data.kuzmin import (
    binarize_label,
    load_kuzmin_tsv,
    normalize_gene,
    parse_kuzmin_tsv,
    split_query_strain,
)
from trigenicinteractionpredictor_tpu.data.packing import TripletDataset
from trigenicinteractionpredictor_tpu.data.splits import kfold_splits, train_test_split
from trigenicinteractionpredictor_tpu.data.synthetic import (
    sample_synthetic_dataset,
    write_kuzmin_like_tsv,
)


def test_normalize_gene_strips_alleles():
    assert normalize_gene("ydl227c-1") == "YDL227C"
    assert normalize_gene("YOR202W_ts3") == "YOR202W"
    assert normalize_gene(" ybr123c ") == "YBR123C"
    assert normalize_gene("ydl227c-1", strip_allele_suffix=False) == "YDL227C-1"


def test_split_query_strain():
    assert split_query_strain("ydl227c-a1+yor202w") == ("YDL227C", "YOR202W")
    assert split_query_strain("notwoplus") is None
    assert split_query_strain("a+b+c") is None


def test_binarize_label_modes():
    cfg = DataConfig()
    assert binarize_label(tau=-0.2, p_value=0.01, cfg=cfg) == 1
    assert binarize_label(tau=0.2, p_value=0.01, cfg=cfg) == 1       # abs mode
    assert binarize_label(tau=-0.2, p_value=0.2, cfg=cfg) == 0       # p too big
    assert binarize_label(tau=-0.01, p_value=0.01, cfg=cfg) == 0     # tau small
    neg = DataConfig(tau_mode="negative")
    assert binarize_label(tau=0.2, p_value=0.01, cfg=neg) == 0
    assert binarize_label(tau=-0.2, p_value=0.01, cfg=neg) == 1


def test_parser_header_and_filtering():
    text = (
        "Query strain ID\tArray strain ID\tCombined mutant type\t"
        "Raw genetic interaction score (epsilon)\t"
        "Adjusted genetic interaction score (epsilon or tau)\tP-value\n"
        "ya001w-d1+ya002w\tya003w\ttrigenic\t-0.3\t-0.25\t0.001\n"
        "ya001w+ya002w\tya004w\tdigenic\t-0.3\t-0.25\t0.001\n"     # filtered
        "ya005w+ya006w_x\tya007w\ttrigenic\t0.01\t0.02\t0.5\n"     # label 0
        "badquery\tya008w\ttrigenic\t-0.3\t-0.25\t0.001\n"         # malformed
    )
    ds = parse_kuzmin_tsv(text)
    assert ds.n_rows == 2
    assert ds.ratings.tolist() == [1, 0]
    # ids are sorted-name order: YA001W < YA002W < ... regardless of row order
    assert ds.gene_names == sorted(ds.gene_names)


def test_tsv_round_trip(tmp_path):
    path = str(tmp_path / "synthetic_kuzmin.tsv")
    n_pos = write_kuzmin_like_tsv(path, n_rows=300, n_genes=25, seed=3)
    ds = load_kuzmin_tsv(path)
    assert ds.n_rows > 0
    assert int(ds.ratings.sum()) == n_pos
    assert ds.triplets.max() < ds.n_genes
    # No self-pairs within a triplet row.
    t = ds.triplets
    assert not ((t[:, 0] == t[:, 1]) | (t[:, 1] == t[:, 2]) | (t[:, 0] == t[:, 2])).any()


def test_padding_and_degrees():
    ds, _, _ = sample_synthetic_dataset(100, 10, 2, seed=0)
    padded = ds.pad_to(128)
    assert padded.n_rows == 128 and padded.n_real == 100
    np.testing.assert_array_equal(padded.degrees(), ds.degrees())
    assert ds.degrees().sum() == 300  # 3 slots per real row


def test_npz_round_trip(tmp_path):
    ds, _, _ = sample_synthetic_dataset(64, 12, 2, seed=1)
    path = str(tmp_path / "ds.npz")
    ds.save_npz(path)
    back = TripletDataset.load_npz(path)
    np.testing.assert_array_equal(back.triplets, ds.triplets)
    np.testing.assert_array_equal(back.ratings, ds.ratings)
    assert back.n_genes == ds.n_genes and back.n_ratings == ds.n_ratings


def test_train_test_split_partition():
    ds, _, _ = sample_synthetic_dataset(1000, 40, 3, seed=2)
    tr, te = train_test_split(ds, test_fraction=0.2, seed=5)
    assert tr.n_rows + te.n_rows == ds.n_rows
    assert te.n_rows == 200
    # Deterministic under the same seed.
    tr2, te2 = train_test_split(ds, test_fraction=0.2, seed=5)
    np.testing.assert_array_equal(te.triplets, te2.triplets)


def test_kfold_partition():
    ds, _, _ = sample_synthetic_dataset(500, 30, 3, seed=4)
    seen = []
    for f, tr, te in kfold_splits(ds, 5, seed=1):
        assert tr.n_rows + te.n_rows == ds.n_rows
        seen.append(te.triplets)
    # Folds' test sets tile the dataset.
    assert sum(len(s) for s in seen) == ds.n_rows


def test_sorted_by_gene_contiguous():
    ds, _, _ = sample_synthetic_dataset(200, 15, 2, seed=6)
    s = ds.sorted_by_gene(0)
    assert (np.diff(s.triplets[:, 0]) >= 0).all()
    # Same multiset of rows.
    a = np.sort(ds.triplets.view([("", ds.triplets.dtype)] * 3), axis=0)
    b = np.sort(s.triplets.view([("", s.triplets.dtype)] * 3), axis=0)
    np.testing.assert_array_equal(a, b)


def test_binarize_label_nan_pvalue_is_negative():
    """NaN p-value must fail the significance test (label 0), matching the
    native parser's comparison direction."""
    from trigenicinteractionpredictor_tpu.config import DataConfig

    cfg = DataConfig()
    assert binarize_label(tau=-0.5, p_value=float("nan"), cfg=cfg) == 0
    assert binarize_label(tau=float("nan"), p_value=0.001, cfg=cfg) == 0
