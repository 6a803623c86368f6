"""Test harness config: force an 8-device virtual CPU mesh.

Tests must never require real TPU hardware; multi-chip sharding is validated
on `--xla_force_host_platform_device_count=8` CPU devices (see the driver's
`dryrun_multichip` contract in `__graft_entry__.py`).

Note: the `axon` TPU plugin in this image ignores ``JAX_PLATFORMS``, so we
instead pin ``jax_default_device`` to a CPU device after import; mesh-using
tests request ``jax.devices("cpu")`` explicitly via the ``cpu_devices``
fixture.
"""

import os

# Must run before jax is imported anywhere.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def cpu_devices():
    return jax.devices("cpu")
