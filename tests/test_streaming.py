"""Beyond-HBM streaming loader behind the stepwise path (VERDICT r1 item 9).

The claim to back: a dataset larger than one chip's HBM can train through
stepwise EM with only one minibatch GROUP resident on device at a time,
reading the host side through memory-mapped files.  Simulated on CPU with
an artificial cap: the grouped dispatch must reproduce the monolithic
whole-epoch dispatch EXACTLY (the EMA update depends only on the carried
counter t and the explicit full-data w_total), and the memmap on-disk
layout must round-trip.
"""

import numpy as np

from trigenicinteractionpredictor_tpu.config import Config, EngineConfig, TrainConfig
from trigenicinteractionpredictor_tpu.data.packing import TripletDataset
from trigenicinteractionpredictor_tpu.data.synthetic import (
    sample_synthetic_dataset,
)
from trigenicinteractionpredictor_tpu.train.trainer import fit


def test_load_dir_memmap_roundtrip(tmp_path):
    ds, _, _ = sample_synthetic_dataset(1000, 30, 3, seed=0)
    ds.save_dir(str(tmp_path / "store"))
    back = TripletDataset.load_dir(str(tmp_path / "store"), mmap=True)
    # __post_init__'s asarray may rewrap the memmap as an ndarray view;
    # either way the data must remain disk-backed, not a RAM copy.
    t = back.triplets
    assert isinstance(t, np.memmap) or isinstance(t.base, np.memmap), type(t)
    np.testing.assert_array_equal(back.triplets, ds.triplets)
    np.testing.assert_array_equal(back.ratings, ds.ratings)
    assert back.n_genes == ds.n_genes and back.gene_names == ds.gene_names
    # degrees() works straight off the memmap
    np.testing.assert_array_equal(back.degrees(), ds.degrees())


def test_streamed_epoch_equals_monolithic(tmp_path):
    """stream_groups > 0 splits each epoch into several device dispatches;
    the parameter trajectory must be bit-comparable to the whole-epoch
    dispatch (same shuffles, same rho_t sequence, same full-data scale)."""
    ds, _, _ = sample_synthetic_dataset(4096, 24, 3, seed=2)

    def cfg(stream_groups):
        return Config(
            train=TrainConfig(
                k=3, sweeps=4, samples=2, minibatch=256, likelihood_freq=1,
                seed=7, stream_groups=stream_groups,
            )
        )

    mono = fit(cfg(0), ds)
    streamed = fit(cfg(4), ds)  # 16 minibatches -> 4 dispatches of 4
    np.testing.assert_allclose(
        np.asarray(streamed.states.theta),
        np.asarray(mono.states.theta),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        streamed.final_loglik, mono.final_loglik, rtol=1e-6
    )


def test_streamed_fit_residency_is_group_bounded(tmp_path, monkeypatch):
    """End to end (epochs + final likelihood): peak residency is
    O(group*mb), not O(N) — pad_to() is never called (it concatenates a
    whole-dataset host copy), and no single device transfer exceeds the
    group window (VERDICT r2 item 3a+3b)."""
    import jax

    N, mbatch, groups = 8192, 256, 2
    ds, _, _ = sample_synthetic_dataset(N, 32, 3, seed=3)
    ds.save_dir(str(tmp_path / "big"))
    store = TripletDataset.load_dir(str(tmp_path / "big"), mmap=True)

    def no_pad(self, multiple):
        raise AssertionError(
            "pad_to() materializes the whole dataset — the beyond-HBM "
            "stepwise path must never call it"
        )

    monkeypatch.setattr(TripletDataset, "pad_to", no_pad)

    max_bytes = 0
    real_put = jax.device_put

    def tracking_put(x, *a, **k):
        nonlocal max_bytes
        for leaf in jax.tree.leaves(x):
            if hasattr(leaf, "nbytes"):
                max_bytes = max(max_bytes, int(leaf.nbytes))
        return real_put(x, *a, **k)

    monkeypatch.setattr(jax, "device_put", tracking_put)

    cfg = Config(
        train=TrainConfig(
            k=3, sweeps=3, samples=2, minibatch=mbatch, likelihood_freq=1,
            seed=4, stream_groups=groups,
        ),
        # Pin the pad multiple so mb stays at the requested 256 rows (the
        # default 512 would round the window up and loosen the bound).
        engine=EngineConfig(batch_pad_multiple=mbatch),
    )
    result = fit(cfg, store)
    assert np.isfinite(result.final_loglik).all()
    window_rows = groups * mbatch  # 512 of the 8192 dataset rows
    window_bytes = window_rows * 3 * 4  # the int32 triplets of one group
    assert 0 < max_bytes <= window_bytes, (
        f"a device transfer of {max_bytes} bytes exceeds the "
        f"{window_bytes}-byte group window — O(N) residency leak"
    )


def test_streamed_fit_from_memmap_store(tmp_path):
    """End to end: memmapped store -> streamed stepwise fit.  The device
    only ever sees one group (512 rows here) of the 8192-row dataset —
    the CPU-simulable stand-in for a beyond-HBM dataset."""
    ds, _, _ = sample_synthetic_dataset(8192, 32, 3, alpha_theta=0.3, seed=5)
    ds.save_dir(str(tmp_path / "big"))
    store = TripletDataset.load_dir(str(tmp_path / "big"), mmap=True)
    cfg = Config(
        train=TrainConfig(
            k=3, sweeps=6, samples=2, minibatch=256, likelihood_freq=2,
            seed=1, stream_groups=2,
        )
    )
    result = fit(cfg, store)
    assert result.sweeps_run == 6
    assert np.isfinite(result.final_loglik).all()
    theta = np.asarray(result.states.theta)
    np.testing.assert_allclose(theta.sum(axis=-1), 1.0, atol=1e-5)
