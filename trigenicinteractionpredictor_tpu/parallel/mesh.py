"""Device-mesh construction (SURVEY.md §3.3).

Two mesh axes cover this workload's parallelism:

- ``data``:     the triplet list shards across chips (data parallelism —
                the reference's serial sweep, gone wide);
- ``ensemble``: independent random restarts shard across chips (the
                "expert parallelism" of this workload — the reference's
                serial ``for sample in range(S)`` loop, gone wide).

theta and p are tiny (KB-MB) and stay replicated; the only cross-chip
traffic is one psum of sufficient statistics per sweep.  Tensor parallelism
over p's K^3 cells only pays at K >~ 50 and is deliberately not in the
minimum slice (SURVEY.md §3.3); pipeline/sequence parallelism are
inapplicable to a single fused EM stage (documented-and-skipped).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
ENSEMBLE_AXIS = "ensemble"
MODEL_AXIS = "model"


def make_mesh(
    data: Optional[int] = None,
    ensemble: int = 1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build an (ensemble, model, data) mesh over the given (or all) devices.

    ``data=None`` uses every device not consumed by the other axes.  The
    ``model`` axis shards the K^3 group tensor p for the large-K regime
    (parallel/tensor_parallel.py); it is 1 — and the axis inert — in the
    production Kuzmin-scale configuration.  The axis always exists on the
    mesh so the same jitted step handles both cases.
    """
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if data is None:
        if n % (ensemble * model) != 0:
            raise ValueError(
                f"{n} devices not divisible by ensemble*model="
                f"{ensemble * model}"
            )
        data = n // (ensemble * model)
    if ensemble * model * data > n:
        raise ValueError(
            f"mesh {ensemble}x{model}x{data} needs "
            f"{ensemble * model * data} devices, have {n}"
        )
    grid = np.asarray(devs[: ensemble * model * data]).reshape(
        ensemble, model, data
    )
    return Mesh(grid, (ENSEMBLE_AXIS, MODEL_AXIS, DATA_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(data=1, ensemble=1)
