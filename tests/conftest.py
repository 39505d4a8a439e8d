"""Test bootstrap: force an 8-virtual-device CPU mesh (SURVEY.md §5.4).

The axon PJRT plugin registers a single real TPU at interpreter start (via
sitecustomize); tests run on CPU with 8 virtual devices so sharding logic is
exercised without hardware and without the multi-minute TPU compile latency.
``jax.config.update('jax_platforms', 'cpu')`` after import wins over the
plugin's platform selection (verified in-session).
"""

import os

# Must be set before the CPU backend initializes.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert devs[0].platform == "cpu"
    return devs


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)
