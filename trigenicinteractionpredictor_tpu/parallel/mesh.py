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


def make_mesh(
    data: Optional[int] = None,
    ensemble: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build an (ensemble, data) mesh over the given (or all) devices.

    ``data=None`` uses every device not consumed by the ensemble axis.
    """
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if data is None:
        if n % ensemble != 0:
            raise ValueError(f"{n} devices not divisible by ensemble={ensemble}")
        data = n // ensemble
    if ensemble * data > n:
        raise ValueError(
            f"mesh {ensemble}x{data} needs {ensemble * data} devices, have {n}"
        )
    grid = np.asarray(devs[: ensemble * data]).reshape(ensemble, data)
    return Mesh(grid, (ENSEMBLE_AXIS, DATA_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(data=1, ensemble=1)
