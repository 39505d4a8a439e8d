"""Tests for train/stream_prep.py (round-5 streaming host pipeline).

The streaming trainer's host prep must stay O(group*mb)-resident and
bit-equivalent to the reference per-minibatch implementation:

- the sliced Feistel epoch permutation is a bijection whose disjoint
  slices partition the full permutation (THE property that lets every
  worker compute its own indices with no O(N) host object anywhere);
- the vectorized group rating-sort equals rating_sort_pad +
  apply_rating_sort looped per minibatch, array-for-array;
- the spawn-process pool produces the same batches as in-thread prep.
"""

import numpy as np
import pytest

from trigenicinteractionpredictor_tpu.train.stream_prep import (
    StreamPrep,
    epoch_perm_slice,
    rsort_pad_group,
)


@pytest.mark.parametrize("n", [1, 7, 64, 1000, 4096, 100003])
def test_epoch_perm_is_bijection(n):
    full = epoch_perm_slice(seed=3, epoch=2, n=n, lo=0, hi=n)
    assert full.shape == (n,)
    assert np.array_equal(np.sort(full), np.arange(n))


def test_epoch_perm_slices_partition():
    n = 12345
    full = epoch_perm_slice(seed=1, epoch=5, n=n, lo=0, hi=n)
    cuts = [0, 17, 1024, 5000, n]
    parts = [
        epoch_perm_slice(seed=1, epoch=5, n=n, lo=a, hi=b)
        for a, b in zip(cuts[:-1], cuts[1:])
    ]
    assert np.array_equal(np.concatenate(parts), full)


def test_epoch_perm_varies_by_epoch_and_seed():
    n = 2048
    a = epoch_perm_slice(0, 0, n, 0, n)
    b = epoch_perm_slice(0, 1, n, 0, n)
    c = epoch_perm_slice(1, 0, n, 0, n)
    assert not np.array_equal(a, b)
    assert not np.array_equal(a, c)
    # deterministic: same args -> same permutation (resume replay)
    assert np.array_equal(a, epoch_perm_slice(0, 0, n, 0, n))


def test_epoch_perm_actually_shuffles():
    n = 100000
    p = epoch_perm_slice(7, 3, n, 0, n)
    # displacement should look uniform, not near-identity
    disp = np.abs(p - np.arange(n))
    assert disp.mean() > n / 10


@pytest.mark.parametrize(
    "group,mb,d_sh,tile,R,seed",
    [
        (3, 64, 1, 8, 2, 0),
        (2, 128, 2, 16, 2, 1),
        (4, 96, 1, 8, 3, 2),
        (1, 256, 2, 32, 2, 3),
        (2, 64, 2, 8, 4, 4),
    ],
)
def test_rsort_pad_group_matches_reference(group, mb, d_sh, tile, R, seed):
    from trigenicinteractionpredictor_tpu.ops.pallas_em_rsorted import (
        apply_rating_sort,
        rating_sort_pad,
    )

    rng = np.random.default_rng(seed)
    B = mb // d_sh
    ft = B // tile + R
    n_rows = group * mb
    trip = rng.integers(0, 50, size=(n_rows, 3), dtype=np.int32)
    rat = rng.integers(0, R, size=n_rows, dtype=np.int32)
    wts = rng.random(n_rows).astype(np.float32)

    got_t, got_r, got_w, got_tiler = rsort_pad_group(
        trip, rat, wts, group=group, n_ratings=R, tile=tile,
        n_shards=d_sh, n_tiles=ft,
    )

    mb_b = ft * tile * d_sh
    for m in range(group):
        sl = slice(m * mb, (m + 1) * mb)
        plan = rating_sort_pad(rat[sl], R, tile=tile, n_shards=d_sh,
                               n_tiles=ft)
        t_, r_, w_ = apply_rating_sort(
            plan, trip[sl], rat[sl], wts[sl], n_shards=d_sh
        )
        assert np.array_equal(got_t[m], t_), f"trip mismatch at m={m}"
        assert np.array_equal(got_r[m], r_), f"rat mismatch at m={m}"
        assert np.array_equal(got_w[m], w_), f"wts mismatch at m={m}"
        assert np.array_equal(got_tiler[m], plan.tile_r)
        assert got_t[m].shape[0] == mb_b


def _mk_layout(n, mb, group, rsort, tile=8, d_sh=1, R=2):
    B = mb // d_sh
    ft = B // tile + R if rsort else 0
    return {
        "seed": 11,
        "n": n,
        "n_padded": -(-n // mb) * mb,
        "mb": mb,
        "mb_b": ft * tile * d_sh if rsort else mb,
        "group": group,
        "arity": 3,
        "rsort": rsort,
        "n_ratings": R,
        "tile": tile,
        "n_shards": d_sh,
        "n_tiles": ft,
    }


@pytest.mark.parametrize("rsort", [False, True])
def test_stream_prep_inthread(rsort):
    from trigenicinteractionpredictor_tpu.data.packing import TripletDataset

    rng = np.random.default_rng(0)
    n, mb, group = 500, 64, 2
    ds = TripletDataset(
        triplets=rng.integers(0, 20, size=(n, 3), dtype=np.int32),
        ratings=rng.integers(0, 2, size=n, dtype=np.int32),
        weights=np.ones(n, np.float32),
        n_genes=20,
        n_ratings=2,
    )
    sp = StreamPrep(ds, _mk_layout(n, mb, group, rsort), workers=1)
    try:
        out = sp.prep_group(0, 0)
        lay = _mk_layout(n, mb, group, rsort)
        assert np.asarray(out["trip"]).shape == (group, lay["mb_b"], 3)
        # padding rows are weight-0; real weights sum preserved across an
        # epoch's groups
        n_dispatch = lay["n_padded"] // (group * mb)
        total = sum(
            float(np.asarray(sp.prep_group(0, d)["wts"]).sum())
            for d in range(n_dispatch)
        )
        assert total == pytest.approx(float(ds.weights.sum()))
    finally:
        sp.close()


@pytest.mark.slow
def test_stream_prep_pool_matches_inthread(tmp_path):
    """Spawn-pool prep must produce byte-identical batches to in-thread
    prep, reading the dataset back through its memmap files."""
    from trigenicinteractionpredictor_tpu.data.packing import TripletDataset

    rng = np.random.default_rng(1)
    n, mb, group = 1000, 128, 4
    ds = TripletDataset(
        triplets=rng.integers(0, 30, size=(n, 3), dtype=np.int32),
        ratings=rng.integers(0, 2, size=n, dtype=np.int32),
        weights=rng.random(n).astype(np.float32),
        n_genes=30,
        n_ratings=2,
    )
    ds.save_dir(str(tmp_path / "ds"))
    ds_mm = TripletDataset.load_dir(str(tmp_path / "ds"), mmap=True)

    lay = _mk_layout(n, mb, group, rsort=True, tile=16, d_sh=2)
    ref = StreamPrep(ds, lay, workers=1)
    pool = StreamPrep(ds_mm, lay, workers=2)
    try:
        assert pool._pool is not None, "spawn pool failed to start"
        for ep, d in [(0, 0), (0, 1), (1, 0)]:
            a = ref.prep_group(ep, d)
            b = pool.prep_group(ep, d)
            for key in a:
                assert np.array_equal(
                    np.asarray(a[key]), np.asarray(b[key])
                ), f"{key} mismatch at ep={ep} d={d}"
    finally:
        ref.close()
        pool.close()
