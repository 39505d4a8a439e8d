"""Backend dispatch: the Pallas kernel must slot into the sharded trainer
(vmap over restarts + shard_map over data) and reproduce the jnp path."""

import numpy as np
import pytest

from trigenicinteractionpredictor_tpu.config import Config, EngineConfig, MeshConfig, TrainConfig
from trigenicinteractionpredictor_tpu.data.splits import train_test_split
from trigenicinteractionpredictor_tpu.data.synthetic import sample_synthetic_dataset
from trigenicinteractionpredictor_tpu.ops.dispatch import kernel_fits, resolve_stats_fn
from trigenicinteractionpredictor_tpu.train.trainer import fit


def test_kernel_fits_budget():
    assert kernel_fits(1000, 10, 512)          # bench scale, on-chip validated
    assert kernel_fits(1300, 10, 256)          # Kuzmin gene count, smaller tile
    assert not kernel_fits(1300, 10, 512)      # 16 MB of one-hots alone
    assert not kernel_fits(200_000, 10, 512)   # too many genes
    # Wide ensembles eventually shrink the tile (S-wide lane streams);
    # S=10 at bench scale still fits through the production scan path.
    assert kernel_fits(1000, 10, 512, n_samples=10)
    assert not kernel_fits(1000, 10, 512, n_samples=24)
    assert kernel_fits(1000, 10, 256, n_samples=24)


def test_resolve_auto_on_cpu_is_jnp():
    assert resolve_stats_fn("auto", 1000, 10) is None  # tests run on CPU
    assert resolve_stats_fn("jnp", 1000, 10) is None
    assert resolve_stats_fn("pallas", 1000, 10) is not None
    with pytest.raises(ValueError):
        resolve_stats_fn("pallas", 500_000, 10)
    with pytest.raises(ValueError):
        resolve_stats_fn("nope", 10, 10)


@pytest.mark.slow
def test_pallas_backend_through_trainer_matches_jnp(tmp_path):
    """Full fit with backend='pallas' (interpret mode on CPU) == jnp fit.

    Exercises vmap(restarts) + shard_map(data) around the kernel.
    """
    ds, _, _ = sample_synthetic_dataset(600, 30, 3, n_ratings=2, seed=1)
    train, _ = train_test_split(ds, 0.2, seed=0)

    def cfg(backend):
        return Config(
            train=TrainConfig(k=3, sweeps=8, samples=2, likelihood_freq=4),
            mesh=MeshConfig(data=2, ensemble=2),
            engine=EngineConfig(backend=backend, tile_b=128, batch_pad_multiple=128),
            out_dir=str(tmp_path),
        )

    jnp_res = fit(cfg("jnp"), train)
    pl_res = fit(cfg("pallas"), train)
    np.testing.assert_allclose(
        pl_res.final_loglik, jnp_res.final_loglik, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(pl_res.states.theta),
        np.asarray(jnp_res.states.theta),
        atol=1e-4,
    )
