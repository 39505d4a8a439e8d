"""Runtime compute-integrity sentinel (SURVEY.md §6 "Failure detection").

The experimental axon TPU backend has been observed to miscompile fused
XLA graphs (see ops/em.py) in ways that silently corrupt results —
sufficient statistics come back ~100x too small while every op is correct
in isolation.  Because such bugs are fusion-context dependent, the engine
verifies itself at runtime: before a training run on an accelerator, one
EM-stats call on a synthetic probe batch is checked against the same
computation on the host CPU backend.

This is the TPU-era analog of the reference's implicit "likelihood must
increase" eyeball check — but automated, and run where silent corruption
would actually enter.
"""

from __future__ import annotations

import functools
import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class ComputeIntegrityError(RuntimeError):
    """The accelerator produced results inconsistent with the host CPU."""


@functools.lru_cache(maxsize=None)
def _probe_result(platform: str, n: int, g: int, k: int, r: int) -> bool:
    """Run the probe once per (platform, shape); cache the verdict."""
    from trigenicinteractionpredictor_tpu.models.mmsbm import init_state
    from trigenicinteractionpredictor_tpu.ops.em import Batch, em_sufficient_stats

    rng = np.random.default_rng(0)
    trip = rng.integers(0, g, size=(n, 3), dtype=np.int32)
    ratings = rng.integers(0, r, size=n, dtype=np.int32)
    weights = np.ones(n, dtype=np.float32)

    state = init_state(jax.random.key(0), g, k, r)
    theta_np, p_np = np.asarray(state.theta), np.asarray(state.p)

    def run(device):
        args = [
            jax.device_put(jnp.asarray(a), device)
            for a in (theta_np, p_np, trip, ratings, weights)
        ]
        out = jax.jit(
            lambda th, p, t, rr, w: em_sufficient_stats(th, p, Batch(t, rr, w))
        )(*args)
        return [np.asarray(x) for x in out]

    acc = run(jax.devices()[0])
    cpu = run(jax.devices("cpu")[0])
    for name, a, c in zip(("theta_hat", "p_hat", "loglik"), acc, cpu):
        scale = max(float(np.abs(c).max()), 1.0)
        if float(np.abs(a - c).max()) > 1e-3 * scale:
            warnings.warn(
                f"integrity probe mismatch on {name}: "
                f"max|acc-cpu|={np.abs(a - c).max():.4g} vs scale {scale:.4g}"
            )
            return False
    return True


def check_em_integrity(
    n: int = 32768,
    n_genes: int = 512,
    k: int = 10,
    n_ratings: int = 2,
    raise_on_failure: bool = True,
) -> bool:
    """Verify accelerator EM stats against the host CPU. Cheap; cached.

    No-op (returns True) when already running on CPU.
    """
    platform = jax.devices()[0].platform
    if platform == "cpu":
        return True
    ok = _probe_result(platform, n, n_genes, k, n_ratings)
    if not ok and raise_on_failure:
        raise ComputeIntegrityError(
            "accelerator EM sufficient-statistics disagree with host CPU — "
            "refusing to train on silently-corrupt compute (see ops/em.py "
            "fusion notes)"
        )
    return ok
