"""Parity tests for the large-G Pallas path (ops/pallas_em_large.py).

The one-hot ensemble kernel is capped at G ~ a few thousand by its [Bt, G]
VMEM one-hots; the large-G path must match the jnp reference stats exactly
(same f32 contractions) at gene counts far beyond that cap — including
G = 50k (VERDICT round 1 item 3 acceptance) — in interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trigenicinteractionpredictor_tpu.models.mmsbm import init_state
from trigenicinteractionpredictor_tpu.ops.em import Batch, em_sufficient_stats
from trigenicinteractionpredictor_tpu.ops.pallas_em_large import (
    large_g_ensemble_stats,
    make_scatter_plan,
)


def _make_case(n, g, k, s, r=2, seed=0, tile=128, wb=256, n_shards=1):
    rng = np.random.default_rng(seed)
    trip = rng.integers(0, g, size=(n, 3), dtype=np.int32)
    ratings = rng.integers(0, r, size=(n,), dtype=np.int32)
    weights = (rng.random(n) > 0.1).astype(np.float32)  # some inert rows
    plan = make_scatter_plan(trip, g, n_shards=n_shards, wb=wb, tile=tile)
    batch = Batch(
        triplets=jnp.asarray(trip),
        ratings=jnp.asarray(ratings),
        weights=jnp.asarray(weights),
        scatter_perm=jnp.asarray(plan.perm),
        scatter_lid=jnp.asarray(plan.lid),
        scatter_block=jnp.asarray(plan.block),
    )
    keys = jax.random.split(jax.random.key(seed), s)
    states = jax.vmap(lambda kk: init_state(kk, g, k, r))(keys)
    return batch, states, plan


@pytest.mark.parametrize(
    "n,g,k,s,wb,tile",
    [
        (256, 64, 4, 1, 32, 64),      # tiny, many empty blocks
        (512, 300, 5, 3, 64, 128),    # multi-restart, ragged blocks
        (512, 2048, 4, 2, 256, 128),  # beyond one block per tile
    ],
)
def test_large_g_matches_jnp(n, g, k, s, wb, tile):
    batch, states, plan = _make_case(n, g, k, s, wb=wb, tile=tile)
    got = large_g_ensemble_stats(
        states.theta, states.p, batch,
        tile_b=tile, wb=wb, n_blocks=plan.n_blocks, interpret=True,
    )
    want = jax.vmap(
        lambda th, p: em_sufficient_stats(th, p, batch)
    )(states.theta, states.p)
    np.testing.assert_allclose(
        np.asarray(got.theta_hat), np.asarray(want.theta_hat),
        rtol=2e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(got.p_hat), np.asarray(want.p_hat), rtol=2e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(got.loglik), np.asarray(want.loglik), rtol=2e-5
    )


def test_large_g_at_50k_genes():
    """The acceptance shape: G = 50k, far beyond the one-hot kernel cap."""
    from trigenicinteractionpredictor_tpu.ops.dispatch import kernel_fits

    g = 50_000
    assert not kernel_fits(g, 8, 128)  # the old kernel really cannot run this
    batch, states, plan = _make_case(
        512, g, k=8, s=2, seed=3, tile=128, wb=512
    )
    got = large_g_ensemble_stats(
        states.theta, states.p, batch,
        tile_b=128, wb=512, n_blocks=plan.n_blocks, interpret=True,
    )
    want = jax.vmap(
        lambda th, p: em_sufficient_stats(th, p, batch)
    )(states.theta, states.p)
    np.testing.assert_allclose(
        np.asarray(got.theta_hat), np.asarray(want.theta_hat),
        rtol=2e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(got.loglik), np.asarray(want.loglik), rtol=2e-5
    )


def test_trainer_large_g_matches_jnp(tmp_path):
    """Full fit at a G above the one-hot cap: backend='pallas' resolves to
    the large-G path (plan attached by the trainer) and matches the jnp fit
    across a 2-shard data mesh."""
    from trigenicinteractionpredictor_tpu.config import (
        Config,
        EngineConfig,
        MeshConfig,
        TrainConfig,
    )
    from trigenicinteractionpredictor_tpu.data.synthetic import (
        sample_synthetic_dataset,
    )
    from trigenicinteractionpredictor_tpu.ops.dispatch import kernel_fits
    from trigenicinteractionpredictor_tpu.train.trainer import fit

    g = 6000
    assert not kernel_fits(g, 3, 128)  # must take the large-G path
    ds, _, _ = sample_synthetic_dataset(1024, g, 3, seed=4)
    tcfg = TrainConfig(k=3, sweeps=3, samples=2, likelihood_freq=1, seed=0)
    base = Config(
        train=tcfg,
        mesh=MeshConfig(data=2, ensemble=1),
        engine=EngineConfig(backend="pallas", tile_b=128, batch_pad_multiple=128),
    )
    r_pallas = fit(base, ds)
    r_jnp = fit(base.replace(engine=EngineConfig(backend="jnp")), ds)
    np.testing.assert_allclose(
        r_pallas.final_loglik, r_jnp.final_loglik, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(r_pallas.states.theta),
        np.asarray(r_jnp.states.theta),
        rtol=1e-4,
        atol=1e-6,
    )


def test_plan_shard_consistency():
    """Plans built for n_shards > 1 shard evenly and cover every stream row."""
    rng = np.random.default_rng(7)
    n, g, shards = 1024, 500, 4
    trip = rng.integers(0, g, size=(n, 3), dtype=np.int32)
    plan = make_scatter_plan(trip, g, n_shards=shards, wb=128, tile=128)
    assert plan.perm.shape[0] % shards == 0
    assert plan.block.shape[0] % shards == 0
    Lp = plan.perm.shape[0] // shards
    B = n // shards
    for s in range(shards):
        seg_perm = plan.perm[s * Lp : (s + 1) * Lp]
        seg_lid = plan.lid[s * Lp : (s + 1) * Lp]
        real = seg_lid >= 0
        # every real stream row appears exactly once
        assert np.sort(seg_perm[real]).tolist() == list(range(3 * B))
        # lid + wb*block reconstructs the gene id of the permuted stream row
        rows = trip[s * B : (s + 1) * B]
        stream_g = rows.T.reshape(-1)
        tiles = np.repeat(
            plan.block[s * (Lp // 128) : (s + 1) * (Lp // 128)], 128
        )
        recon = seg_lid[real] + 128 * tiles[real]
        np.testing.assert_array_equal(recon, np.sort(stream_g))


def test_grouped_bd_plan_matches_vmapped_jnp():
    """Wide-S large-G band: bd-plan over restart groups under lax.map
    (round 4) == vmapped jnp stats, including a non-divisor remainder."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from trigenicinteractionpredictor_tpu.data.synthetic import (
        sample_synthetic_dataset,
    )
    from trigenicinteractionpredictor_tpu.models import init_state
    from trigenicinteractionpredictor_tpu.ops.dispatch import (
        _grouped_bd_plan_fn,
    )
    from trigenicinteractionpredictor_tpu.ops.em import (
        Batch,
        em_sufficient_stats,
    )
    from trigenicinteractionpredictor_tpu.ops.pallas_em_large import (
        make_scatter_plan,
    )

    n, g, k, r, tile = 384, 60, 4, 2, 128
    ds, _, _ = sample_synthetic_dataset(n, g, k, n_ratings=r, seed=13)
    ds = ds.pad_to(-(-n // tile) * tile)
    plan = make_scatter_plan(np.asarray(ds.triplets), g, n_shards=1,
                             wb=32, tile=tile)
    batch = Batch(
        triplets=jnp.asarray(ds.triplets),
        ratings=jnp.asarray(ds.ratings),
        weights=jnp.asarray(ds.weights),
        scatter_perm=jnp.asarray(plan.perm),
        scatter_lid=jnp.asarray(plan.lid),
        scatter_block=jnp.asarray(plan.block),
    )
    plain = Batch(
        triplets=batch.triplets, ratings=batch.ratings, weights=batch.weights
    )
    for S in (4, 5):  # divisor and remainder cases at group=2
        states = jax.vmap(lambda kk: init_state(kk, g, k, r))(
            jax.random.split(jax.random.key(S), S)
        )
        fn = _grouped_bd_plan_fn(tile, g, group=2, wb=32, g1_fused=False)
        stats = fn(states.theta, states.p, batch)
        ref = jax.vmap(
            lambda th, p: em_sufficient_stats(
                th, p, plain, precision=jax.lax.Precision.HIGHEST
            )
        )(states.theta, states.p)
        np.testing.assert_allclose(
            np.asarray(stats.theta_hat), np.asarray(ref.theta_hat), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(stats.loglik), np.asarray(ref.loglik), rtol=1e-5
        )


def test_fit_dispatches_bd_plan_past_crossover(tmp_path):
    """backend='pallas' at G past the bdr crossover (G>5000, S>=2)
    resolves to the g1-fused bdg kernel (round 5; previously bd-plan) and
    trains end-to-end through fit() (interpret mode on CPU), matching the
    jnp fit — exercising the trainer's g1 row reorder + 2-position
    scatter-plan attach."""
    import numpy as np

    from trigenicinteractionpredictor_tpu.config import (
        Config,
        EngineConfig,
        TrainConfig,
    )
    from trigenicinteractionpredictor_tpu.data.synthetic import (
        sample_synthetic_dataset,
    )
    from trigenicinteractionpredictor_tpu.train.trainer import fit

    # N large enough relative to G that bdg's block-run padding stays
    # under the dispatch bound (_bdg_pad_ok); a tiny-N/large-G shape
    # correctly falls back to the unpadded bd-plan path instead (the
    # G=500k case in test_auto_dispatch_table_on_tpu pins that side).
    ds, _, _ = sample_synthetic_dataset(4200, 5200, 4, n_ratings=2, seed=3)

    def cfg(backend):
        return Config(
            train=TrainConfig(k=4, sweeps=4, samples=2, likelihood_freq=2),
            engine=EngineConfig(backend=backend, tile_b=128,
                                batch_pad_multiple=128),
            out_dir=str(tmp_path),
        )

    res = fit(cfg("pallas"), ds)
    assert res.dispatch["kernel"] == "pallas-bdg-plan", res.dispatch
    ref = fit(cfg("jnp"), ds)
    np.testing.assert_allclose(
        res.final_loglik, ref.final_loglik, rtol=1e-4
    )
