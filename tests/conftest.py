"""Test harness setup: run everything on CPU with 8 virtual devices so
multi-chip sharding (dp/tp meshes) is exercised without TPU hardware
(SURVEY.md §4 implication (d))."""

import os

# Must be set before jax is imported anywhere.  Force CPU even when the
# session default points at a TPU backend — tests emulate a v5e-8 mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The TPU-tunnel site hook (sitecustomize) force-registers its backend and
# overrides JAX_PLATFORMS; pin the platform at the config level too.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def eight_devices():
    import jax

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs
