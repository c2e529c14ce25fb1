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


# Compile-heavy suites (each minutes of XLA/torch work on CPU).  Auto-marked
# so `pytest -m 'not heavy'` is the seconds-scale fast tier while a plain
# `pytest` still runs everything except `slow`.
HEAVY_MODULES = {
    "test_training",
    "test_parallel",
    "test_bart_parity",
    "test_beam_fuzz",
    "test_full_scale_parity",
    "test_end_to_end",
    "test_models",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__.rpartition(".")[2] in HEAVY_MODULES:
            item.add_marker(pytest.mark.heavy)


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
