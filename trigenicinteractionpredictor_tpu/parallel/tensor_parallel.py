"""Tensor parallelism over the K^3 group tensor (SURVEY.md §3.3, optional).

At Kuzmin scale (K ~ 10) theta and p are KB-sized and replication is
optimal — DP + ensemble parallelism are the production axes.  This module
exists for the large-K regime (K >~ 200, where p[K,K,K,R] and its
sufficient statistics reach hundreds of MB per restart): it shards p and
p_hat over a ``model`` mesh axis and reconstructs the cross-K contractions
with collectives, trading one psum/all_gather pair of [B, K] activations
per sweep for a 1/M memory footprint on every K^3 object.

Sharding layout (per restart):

- theta [G, K]          replicated (G*K is small; its stats need global K)
- p [K, K, K, R]        sharded on axis 1 (the ``l`` position) over ``model``
- batch                 sharded over ``data`` (as in sharded_em.py)
- theta_hat [G, K]      replicated (computed identically on every model rank)
- p_hat                 sharded like p; never leaves the rank

Collectives per sweep: psum of A1/A3/D partials + all_gather of A2 over
``model`` (O(B K / M) each), then the usual psum of (theta_hat, p_hat, L)
over ``data``.  The trigenic factorized algebra is the same as
ops/em.py::em_sufficient_stats, re-partitioned; see that docstring for the
math.  Trigenic (arity-3) only — the pairwise family's p is K^2-scale and
never needs TP.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from trigenicinteractionpredictor_tpu.models.mmsbm import ModelState
from trigenicinteractionpredictor_tpu.ops.em import (
    _EPS,
    Batch,
    SweepStats,
    _gather_thetas,
    _scatter_add_rows,
    map_restarts as _map_restarts,
    normalize_from_stats,
)
from trigenicinteractionpredictor_tpu.parallel.mesh import (
    DATA_AXIS,
    ENSEMBLE_AXIS,
    MODEL_AXIS,
    make_mesh,
)


def make_tp_mesh(
    model: int, data: int = 1, ensemble: int = 1, devices=None
) -> Mesh:
    """An (ensemble, model, data) mesh for the large-K regime.

    Composes with the ensemble axis: restarts shard over ``ensemble``,
    p's ``l`` axis over ``model``, triplet rows over ``data`` — the three
    parallelism tiers of this workload on one mesh (SURVEY.md §3.3).
    """
    return make_mesh(
        data=data, ensemble=ensemble, model=model, devices=devices
    )


# Sharding specs for restart-stacked TP state: theta [S, G, K] shards its
# restart axis over ``ensemble`` and replicates over model/data; p
# [S, K, K, K, R] additionally shards its l axis (axis 2) over ``model``.
TP_STATE_SPEC = ModelState(
    theta=P(ENSEMBLE_AXIS),
    p=P(ENSEMBLE_AXIS, None, MODEL_AXIS, None, None),
)


def shard_tp_state(mesh: Mesh, states: ModelState) -> ModelState:
    """Place restart-stacked states per TP_STATE_SPEC."""
    theta = jax.device_put(
        states.theta, NamedSharding(mesh, TP_STATE_SPEC.theta)
    )
    p = jax.device_put(states.p, NamedSharding(mesh, TP_STATE_SPEC.p))
    return ModelState(theta=theta, p=p)


def shard_tp_batch(mesh: Mesh, batch: Batch) -> Batch:
    sh = NamedSharding(mesh, P(DATA_AXIS))
    return Batch(
        triplets=jax.device_put(batch.triplets, sh),
        ratings=jax.device_put(batch.ratings, sh),
        weights=jax.device_put(batch.weights, sh),
    )


def replicate_tp(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def _tp_local_stats(
    theta: jax.Array,      # [G, K] replicated
    p_blk: jax.Array,      # [K, Kb, K, R] — this rank's l-block
    batch: Batch,
    precision,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One restart's sufficient stats with p sharded over ``model``.

    Returns (theta_hat [G, K] — identical on every model rank, p_hat_blk —
    this rank's block, loglik scalar).
    """
    G, K = theta.shape
    Kb = p_blk.shape[1]
    R = p_blk.shape[-1]
    B = batch.triplets.shape[0]
    r = batch.ratings
    w = batch.weights.astype(theta.dtype)

    th1, th2, th3 = _gather_thetas(theta, batch.triplets)
    rank = jax.lax.axis_index(MODEL_AXIS)
    th2_blk = jax.lax.dynamic_slice_in_dim(th2, rank * Kb, Kb, axis=1)

    # T[b, k, lb] = sum_m th3[b, m] p_blk[k, lb, m, r_b]
    p_m = jnp.transpose(p_blk, (2, 0, 1, 3)).reshape(K, K * Kb * R)
    T_all = jnp.matmul(th3, p_m, precision=precision).reshape(B, K, Kb, R)
    T = jnp.take_along_axis(T_all, r[:, None, None, None], axis=3)[..., 0]

    # Cross-K contractions: partial on the l-block, completed collectively.
    A1 = jax.lax.psum(
        jnp.einsum("bkl,bl->bk", T, th2_blk, precision=precision), MODEL_AXIS
    )
    A2_blk = jnp.einsum("bkl,bk->bl", T, th1, precision=precision)
    A2 = jax.lax.all_gather(A2_blk, MODEL_AXIS, axis=1, tiled=True)

    W_blk = (th1[:, :, None] * th2_blk[:, None, :]).reshape(B, K * Kb)
    A3_all = jnp.matmul(
        W_blk, p_blk.reshape(K * Kb, K * R), precision=precision
    ).reshape(B, K, R)
    A3 = jax.lax.psum(
        jnp.take_along_axis(A3_all, r[:, None, None], axis=2)[..., 0], MODEL_AXIS
    )
    D = jnp.einsum("bk,bk->b", th1, A1, precision=precision)

    scale = w / (D + _EPS)
    s1 = th1 * A1 * scale[:, None]
    s2 = th2 * A2 * scale[:, None]
    s3 = th3 * A3 * scale[:, None]
    theta_hat = _scatter_add_rows((s1, s2, s3), batch.triplets, G)

    V_blk = W_blk * scale[:, None]
    onehot_r = jax.nn.one_hot(r, R, dtype=theta.dtype)
    th3r = (th3[:, :, None] * onehot_r[:, None, :]).reshape(B, K * R)
    S_blk = jnp.matmul(V_blk.T, th3r, precision=precision)
    p_hat_blk = p_blk * S_blk.reshape(K, Kb, K, R)

    loglik = jnp.sum(w * jnp.log(D + _EPS))
    return theta_hat, p_hat_blk, loglik


def _tp_local_sweep(states, batch, degrees, precision):
    """One TP EM sweep on local shards (inside shard_map)."""
    theta_hat, p_hat_blk, ll = _map_restarts(
        lambda st: _tp_local_stats(st.theta, st.p, batch, precision), states
    )
    theta_hat, p_hat_blk, ll = jax.lax.psum(
        (theta_hat, p_hat_blk, ll), DATA_AXIS
    )
    new_states = jax.vmap(normalize_from_stats, in_axes=(0, 0, None))(
        states,
        SweepStats(theta_hat=theta_hat, p_hat=p_hat_blk, loglik=ll),
        degrees,
    )
    return new_states, ll


def make_tp_train_step(
    mesh: Mesh,
    precision=jax.lax.Precision.HIGHEST,
) -> Callable[[ModelState, Batch, jax.Array], Tuple[ModelState, jax.Array]]:
    """Jitted EM step with p tensor-parallel over ``model``, the batch
    data-parallel over ``data``, and the restart axis sharded over
    ``ensemble`` (size-1 axes are inert, so the same step serves pure-TP
    and TP x EP meshes).  Returns per-restart loglik [S].
    """

    def local_step(states: ModelState, batch: Batch, degrees: jax.Array):
        return _tp_local_sweep(states, batch, degrees, precision)

    shmapped = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(TP_STATE_SPEC, P(DATA_AXIS), P()),
        out_specs=(TP_STATE_SPEC, P(ENSEMBLE_AXIS)),
        check_vma=False,
    )
    return jax.jit(shmapped)


def make_tp_multi_step(
    mesh: Mesh,
    n_inner: int,
    precision=jax.lax.Precision.HIGHEST,
    annealed: bool = False,
) -> Callable:
    """``n_inner`` chained TP sweeps per dispatch under lax.scan — the TP
    counterpart of sharded_em.make_sharded_multi_step, with the same
    optional DAEM-annealing betas argument (elementwise parameter powers
    commute with the l-axis sharding, so the annealed sweep is the same
    local computation on powered shards)."""

    def local_multi(states, batch, degrees, betas):
        def body(carry, beta):
            powered = ModelState(theta=carry.theta**beta, p=carry.p**beta)
            theta_hat, p_hat_blk, ll = _map_restarts(
                lambda st: _tp_local_stats(st.theta, st.p, batch, precision),
                powered,
            )
            theta_hat, p_hat_blk, ll = jax.lax.psum(
                (theta_hat, p_hat_blk, ll), DATA_AXIS
            )
            new = jax.vmap(normalize_from_stats, in_axes=(0, 0, None))(
                carry,
                SweepStats(theta_hat=theta_hat, p_hat=p_hat_blk, loglik=ll),
                degrees,
            )
            return new, ll

        def body_plain(carry, _):
            return _tp_local_sweep(carry, batch, degrees, precision)

        if annealed:
            states, ll_hist = jax.lax.scan(body, states, betas)
        else:
            states, ll_hist = jax.lax.scan(body_plain, states, length=n_inner)
        return states, ll_hist

    shmapped = jax.shard_map(
        local_multi,
        mesh=mesh,
        in_specs=(TP_STATE_SPEC, P(DATA_AXIS), P(), P()),
        out_specs=(TP_STATE_SPEC, P(None, ENSEMBLE_AXIS)),
        check_vma=False,
    )
    jitted = jax.jit(shmapped)
    if annealed:
        return jitted

    def call(states, batch, degrees):
        ones = jax.device_put(
            jnp.ones((n_inner,), jnp.float32), NamedSharding(mesh, P())
        )
        return jitted(states, batch, degrees, ones)

    return call


def _tp_local_ll(theta, p_blk, batch, precision):
    """Per-restart log-likelihood with p sharded on its l axis."""
    G, K = theta.shape
    Kb = p_blk.shape[1]
    R = p_blk.shape[-1]
    B = batch.triplets.shape[0]
    w = batch.weights.astype(theta.dtype)
    th1, th2, th3 = _gather_thetas(theta, batch.triplets)
    rank = jax.lax.axis_index(MODEL_AXIS)
    th2_blk = jax.lax.dynamic_slice_in_dim(th2, rank * Kb, Kb, axis=1)
    p_m = jnp.transpose(p_blk, (2, 0, 1, 3)).reshape(K, K * Kb * R)
    T_all = jnp.matmul(th3, p_m, precision=precision).reshape(B, K, Kb, R)
    T = jnp.take_along_axis(
        T_all, batch.ratings[:, None, None, None], axis=3
    )[..., 0]
    D_part = jnp.einsum("bk,bkl,bl->b", th1, T, th2_blk, precision=precision)
    D = jax.lax.psum(D_part, MODEL_AXIS)
    return jnp.sum(w * jnp.log(D + _EPS))


def make_tp_likelihood(
    mesh: Mesh, precision=jax.lax.Precision.HIGHEST
) -> Callable[[ModelState, Batch], jax.Array]:
    """Jitted per-restart log-likelihood on the TP mesh: f32[S]."""

    def local_ll(states: ModelState, batch: Batch):
        ll = _map_restarts(
            lambda st: _tp_local_ll(st.theta, st.p, batch, precision), states
        )
        return jax.lax.psum(ll, DATA_AXIS)

    shmapped = jax.shard_map(
        local_ll,
        mesh=mesh,
        in_specs=(TP_STATE_SPEC, P(DATA_AXIS)),
        out_specs=P(ENSEMBLE_AXIS),
        check_vma=False,
    )
    return jax.jit(shmapped)
