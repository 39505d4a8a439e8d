"""Tests for train/stream_prep.py (round-5 streaming host pipeline).

The streaming trainer's host prep must be bit-equivalent between the
in-thread and the spawn-pool paths, preserve the round-4 (seed, epoch)
shuffle derivation (resume replay), and keep padding inert.
"""

import numpy as np
import pytest

from trigenicinteractionpredictor_tpu.train.stream_prep import (
    StreamPrep,
    epoch_perm,
)


def test_epoch_perm_matches_round4_derivation():
    """Resume-replay contract: the shuffle is the same function of
    (seed, epoch) the round-4 trainer used — checkpoints that replay
    epochs get the identical minibatch sequence."""
    seed, ep, n = 3, 5, 1000
    ref = np.random.default_rng((seed ^ 0x5EED) + 7919 * (ep + 1)).permutation(n)
    got = epoch_perm(seed, ep, n)
    assert np.array_equal(got, ref)
    assert got.dtype == np.int32  # half the index memory below 2^31


def test_epoch_perm_varies_and_is_deterministic():
    n = 2048
    a = epoch_perm(0, 0, n)
    assert not np.array_equal(a, epoch_perm(0, 1, n))
    assert not np.array_equal(a, epoch_perm(1, 0, n))
    assert np.array_equal(a, epoch_perm(0, 0, n))
    assert np.array_equal(np.sort(a), np.arange(n))


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


def test_stream_prep_matches_legacy_trainer_prep():
    """The in-thread StreamPrep output must equal what the round-4
    trainer's inline prep produced for the same (seed, epoch, group):
    same permutation, same gather, same per-minibatch rating sort."""
    from trigenicinteractionpredictor_tpu.data.packing import TripletDataset
    from trigenicinteractionpredictor_tpu.ops.pallas_em_rsorted import (
        apply_rating_sort,
        rating_sort_pad,
    )

    rng = np.random.default_rng(2)
    n, mb, group, tile, d_sh, R = 700, 128, 2, 16, 2, 2
    ds = TripletDataset(
        triplets=rng.integers(0, 30, size=(n, 3), dtype=np.int32),
        ratings=rng.integers(0, R, size=n, dtype=np.int32),
        weights=rng.random(n).astype(np.float32),
        n_genes=30,
        n_ratings=R,
    )
    lay = _mk_layout(n, mb, group, rsort=True, tile=tile, d_sh=d_sh)
    sp = StreamPrep(ds, lay, workers=1)
    try:
        out = sp.prep_group(3, 1)
        # round-4 inline equivalent
        perm = np.random.default_rng((11 ^ 0x5EED) + 7919 * 4).permutation(
            lay["n_padded"]
        )
        gp = perm[1 * group * mb : 2 * group * mb]
        mask = gp < n
        trip = np.zeros((gp.size, 3), np.int32)
        rat = np.zeros(gp.size, np.int32)
        wts = np.zeros(gp.size, np.float32)
        trip[mask] = ds.triplets[gp[mask]]
        rat[mask] = ds.ratings[gp[mask]]
        wts[mask] = ds.weights[gp[mask]]
        ft = lay["n_tiles"]
        for m in range(group):
            sl = slice(m * mb, (m + 1) * mb)
            plan = rating_sort_pad(rat[sl], R, tile=tile, n_shards=d_sh,
                                   n_tiles=ft)
            t_, r_, w_ = apply_rating_sort(
                plan, trip[sl], rat[sl], wts[sl], n_shards=d_sh
            )
            assert np.array_equal(np.asarray(out["trip"])[m], t_)
            assert np.array_equal(np.asarray(out["rat"])[m], r_)
            assert np.array_equal(np.asarray(out["wts"])[m], w_)
            assert np.array_equal(np.asarray(out["tiler"])[m], plan.tile_r)
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
