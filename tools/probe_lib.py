"""Shared harness for tpu_worker probe jobs (tools/tpu_worker.py).

Jobs `import probe_lib` (the worker has the repo root on sys.path; jobs
should `sys.modules.pop('probe_lib', None)` first so edits between jobs
are picked up).  Everything here builds on the SAME production chained
step bench.py times (parallel/sharded_em.make_sharded_multi_step), so
probe numbers are directly comparable to the official records.

`with_alarm` wraps a single probe step in SIGALRM so a wedged remote
compile (observed twice in round 3 at K=25/50, N=131k) turns into a
caught TimeoutError instead of hanging the worker forever.
"""

from __future__ import annotations

import functools
import signal
import time
from typing import Callable, Optional, Tuple


class ProbeTimeout(Exception):
    pass


def with_alarm(seconds: int, fn: Callable, *args, **kwargs):
    """Run fn under SIGALRM; raises ProbeTimeout on expiry.

    Only sound in the main thread (the worker runs jobs there).  A fired
    alarm may leave the relay connection in a bad state — treat a timeout
    like a device fault: finish the job quickly and let the operator
    restart the worker.
    """

    def _handler(signum, frame):
        raise ProbeTimeout(f"probe exceeded {seconds}s")

    old = signal.signal(signal.SIGALRM, _handler)
    signal.alarm(seconds)
    try:
        return fn(*args, **kwargs)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def make_rsorted_batch(n, g, k, r=2, seed=0, tile=256):
    """Synthetic dataset -> rating-sorted sharded Batch + degrees + mesh."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from trigenicinteractionpredictor_tpu.data.synthetic import (
        sample_synthetic_dataset,
    )
    from trigenicinteractionpredictor_tpu.ops.em import Batch
    from trigenicinteractionpredictor_tpu.ops.pallas_em_rsorted import (
        apply_rating_sort,
        rating_sort_pad,
    )
    from trigenicinteractionpredictor_tpu.parallel.mesh import (
        single_device_mesh,
    )
    from trigenicinteractionpredictor_tpu.parallel.sharded_em import (
        replicate,
        shard_batch,
    )

    ds, _, _ = sample_synthetic_dataset(n, g, k, n_ratings=r, seed=seed)
    mesh = single_device_mesh()
    degrees = replicate(mesh, jnp.asarray(ds.degrees()))
    rplan = rating_sort_pad(
        np.asarray(ds.ratings), r, tile=tile, n_shards=mesh.shape["data"]
    )
    t_, r_, w_ = apply_rating_sort(
        rplan,
        np.asarray(ds.triplets),
        np.asarray(ds.ratings),
        np.asarray(ds.weights),
        n_shards=mesh.shape["data"],
    )
    batch = shard_batch(
        mesh,
        Batch(
            triplets=jnp.asarray(t_),
            ratings=jnp.asarray(r_),
            weights=jnp.asarray(w_),
            tile_rating=jnp.asarray(rplan.tile_r),
        ),
    )
    return ds, mesh, batch, degrees, int(rplan.n_rows)


def make_states(mesh, g, k, s, r=2, seed=0):
    import jax

    from trigenicinteractionpredictor_tpu.models.mmsbm import init_state
    from trigenicinteractionpredictor_tpu.parallel.sharded_em import (
        shard_ensemble,
    )

    keys = jax.random.split(jax.random.key(seed), s)
    return shard_ensemble(
        mesh, jax.vmap(lambda kk: init_state(kk, g, k, r))(keys)
    )


def time_step(
    step, states0, batch, degrees, sweeps=60, chunk=10, reps=3
) -> Tuple[float, float]:
    """(best seconds for `sweeps`, final max ll). Compile excluded."""
    import jax.numpy as jnp

    st, ll_hist = step(states0, batch, degrees)
    _ = float(ll_hist[-1, 0])
    best, ll_last = float("inf"), 0.0
    for _ in range(reps):
        st = states0
        t0 = time.perf_counter()
        for _ in range(sweeps // chunk):
            st, ll_hist = step(st, batch, degrees)
        ll_last = float(jnp.max(ll_hist[-1]))
        best = min(best, time.perf_counter() - t0)
    return best, ll_last


def probe_bdr(
    n, g, k, s, tile, group, sweeps=60, reps=3, alarm=300,
    stats_fn_factory: Optional[Callable] = None, chunk=10,
):
    """Compile + time the bdr (or a compatible rsorted) kernel through the
    production chained step.  Returns a result dict; catches OOM/compile
    errors and timeouts into the dict instead of raising."""
    from trigenicinteractionpredictor_tpu.parallel.sharded_em import (
        make_sharded_multi_step,
    )

    rec = dict(n=n, G=g, K=k, S=s, tile=tile, group=group)
    try:
        ds, mesh, batch, degrees, n_rows = make_rsorted_batch(
            n, g, k, tile=tile
        )
        states0 = make_states(mesh, g, k, s)
        if stats_fn_factory is None:
            from trigenicinteractionpredictor_tpu.ops.pallas_em_bdr import (
                bdr_em_ensemble_stats,
            )

            stats_fn = functools.partial(
                bdr_em_ensemble_stats, tile_b=tile, group=group
            )
            stats_fn.ensemble = True
        else:
            stats_fn = stats_fn_factory(tile, group)
        step = make_sharded_multi_step(mesh, chunk, stats_fn=stats_fn)
        t0 = time.perf_counter()
        best, ll = with_alarm(
            alarm, time_step, step, states0, batch, degrees,
            sweeps=sweeps, chunk=chunk, reps=reps,
        )
        rec.update(
            ok=True,
            compile_s=round(time.perf_counter() - t0 - best * reps, 1),
            ms_per_sweep=round(best / sweeps * 1e3, 3),
            upd_per_s=round(n * s * sweeps / best),
            final_ll=ll,
            n_rows=n_rows,
        )
    except ProbeTimeout as e:
        rec.update(ok=False, error="timeout", detail=str(e))
    except Exception as e:  # OOM / compile failure — record, keep going
        rec.update(ok=False, error=type(e).__name__, detail=str(e)[:500])
    return rec


def probe_bdg(
    n, g, k, s, tile, wb1=512, group=0, strict=False,
    alarm=420, sweeps=20, reps=3, chunk=10,
):
    """Compile + time the g1-fused bdg path (round-5 large-G default)
    through the production chained step.  ``group``: 0 = one whole-S
    call; >0 = lax.map over restart groups (the wide-S wrapper)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from trigenicinteractionpredictor_tpu.data.synthetic import (
        sample_synthetic_dataset,
    )
    from trigenicinteractionpredictor_tpu.ops.em import Batch
    from trigenicinteractionpredictor_tpu.ops.pallas_em_bdg import (
        apply_g1_order,
        bdg_em_ensemble_stats,
        make_g1_plan,
    )
    from trigenicinteractionpredictor_tpu.ops.pallas_em_large import (
        make_scatter_plan,
    )
    from trigenicinteractionpredictor_tpu.parallel.mesh import (
        single_device_mesh,
    )
    from trigenicinteractionpredictor_tpu.parallel.sharded_em import (
        make_sharded_multi_step,
        replicate,
        shard_batch,
    )

    rec = dict(n=n, G=g, K=k, S=s, tile=tile, wb1=wb1, group=group,
               strict=strict, label="bdg" if not group else f"bdg-g{group}")
    try:
        ds, _, _ = sample_synthetic_dataset(n, g, k, n_ratings=2, seed=0)
        mesh = single_device_mesh()
        degrees = replicate(mesh, jnp.asarray(ds.degrees()))
        plan = make_g1_plan(np.asarray(ds.triplets), g, wb1=wb1, tile=tile)
        trip, rat, wts = apply_g1_order(
            plan, np.asarray(ds.triplets), np.asarray(ds.ratings),
            np.asarray(ds.weights),
        )
        splan = make_scatter_plan(trip, g, wb=512, tile=tile,
                                  positions=(1, 2))
        batch = shard_batch(
            mesh,
            Batch(
                triplets=jnp.asarray(trip),
                ratings=jnp.asarray(rat),
                weights=jnp.asarray(wts),
                scatter_perm=jnp.asarray(splan.perm),
                scatter_lid=jnp.asarray(splan.lid),
                scatter_block=jnp.asarray(splan.block),
                g1_lid=jnp.asarray(plan.lid1),
                g1_block=jnp.asarray(plan.blk1),
            ),
        )
        call = functools.partial(
            bdg_em_ensemble_stats, tile_b=tile, wb1=wb1,
            n_blocks1=plan.n_blocks, wb=512, n_blocks=splan.n_blocks,
            strict=strict,
        )
        if not group:
            fn = functools.partial(call)
            fn.ensemble = True
        else:
            def fn(thetas, ps, b, precision=None):
                Sw = thetas.shape[0]
                n_full = Sw // group
                rem = Sw % group
                outs = []
                if n_full:
                    th_g = thetas[: n_full * group].reshape(
                        n_full, group, *thetas.shape[1:]
                    )
                    p_g = ps[: n_full * group].reshape(
                        n_full, group, *ps.shape[1:]
                    )
                    st = jax.lax.map(
                        lambda tp: call(tp[0], tp[1], b), (th_g, p_g)
                    )
                    outs.append(jax.tree.map(
                        lambda x: x.reshape(n_full * group, *x.shape[2:]),
                        st,
                    ))
                if rem:
                    outs.append(
                        call(thetas[n_full * group:], ps[n_full * group:], b)
                    )
                if len(outs) == 1:
                    return outs[0]
                return jax.tree.map(
                    lambda a, b2: jnp.concatenate([a, b2], 0), *outs
                )
            fn.ensemble = True
        states0 = make_states(mesh, g, k, s)
        step = make_sharded_multi_step(mesh, chunk, stats_fn=fn)
        best, ll = with_alarm(
            alarm, time_step, step, states0, batch, degrees,
            sweeps=sweeps, chunk=chunk, reps=reps,
        )
        rec.update(
            ok=True,
            ms_per_sweep=round(best / sweeps * 1e3, 3),
            upd_per_s=round(n * s * sweeps / best),
            final_ll=ll,
            pad_rows=int(plan.n_rows - n),
        )
    except ProbeTimeout as e:
        rec.update(ok=False, error="timeout", detail=str(e))
    except Exception as e:
        rec.update(ok=False, error=type(e).__name__, detail=str(e)[:500])
    return rec


def probe_bd_plan(n, g, k, s, tile, alarm=420, sweeps=20, reps=1, chunk=10):
    """Compile + time the bd-plan path (block-diag E-step + plan scatter)
    through the production chained step."""
    import jax.numpy as jnp
    import numpy as np

    from trigenicinteractionpredictor_tpu.data.synthetic import (
        sample_synthetic_dataset,
    )
    from trigenicinteractionpredictor_tpu.ops.dispatch import (
        _pallas_bd_plan_fn,
    )
    from trigenicinteractionpredictor_tpu.ops.em import Batch
    from trigenicinteractionpredictor_tpu.ops.pallas_em_large import (
        make_scatter_plan,
    )
    from trigenicinteractionpredictor_tpu.parallel.mesh import (
        single_device_mesh,
    )
    from trigenicinteractionpredictor_tpu.parallel.sharded_em import (
        make_sharded_multi_step,
        replicate,
        shard_batch,
    )

    rec = dict(n=n, G=g, K=k, S=s, tile=tile, group=s)
    try:
        ds, _, _ = sample_synthetic_dataset(n, g, k, n_ratings=2, seed=0)
        mesh = single_device_mesh()
        degrees = replicate(mesh, jnp.asarray(ds.degrees()))
        fn = _pallas_bd_plan_fn(tile, g)
        pad_n = -(-n // tile) * tile
        dsp = ds.pad_to(pad_n)
        plan = make_scatter_plan(
            np.asarray(dsp.triplets), g, n_shards=1, wb=fn.wb, tile=tile
        )
        batch = shard_batch(
            mesh,
            Batch(
                triplets=jnp.asarray(dsp.triplets),
                ratings=jnp.asarray(dsp.ratings),
                weights=jnp.asarray(dsp.weights),
                scatter_perm=jnp.asarray(plan.perm),
                scatter_lid=jnp.asarray(plan.lid),
                scatter_block=jnp.asarray(plan.block),
            ),
        )
        states0 = make_states(mesh, g, k, s)
        step = make_sharded_multi_step(mesh, chunk, stats_fn=fn)
        best, ll = with_alarm(
            alarm, time_step, step, states0, batch, degrees,
            sweeps=sweeps, chunk=chunk, reps=reps,
        )
        rec.update(
            ok=True,
            ms_per_sweep=round(best / sweeps * 1e3, 3),
            upd_per_s=round(n * s * sweeps / best),
            final_ll=ll,
        )
    except ProbeTimeout as e:
        rec.update(ok=False, error="timeout", detail=str(e))
    except Exception as e:
        rec.update(ok=False, error=type(e).__name__, detail=str(e)[:500])
    return rec
