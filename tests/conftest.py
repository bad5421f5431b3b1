"""Test configuration: force an 8-device virtual CPU platform for sharding
tests before JAX initializes. The compute tests themselves run on the
default backend (TPU when present, CPU otherwise)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_mesh_devices():
    """Eight virtual CPU devices for multi-device sharding tests."""
    import jax
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("virtual CPU device farm unavailable")
    return devs[:8]


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def golden(name):
    path = os.path.join(os.path.dirname(__file__), "golden", name + ".npz")
    if not os.path.exists(path):
        pytest.skip(f"golden fixture {name} missing (run tests/make_golden.py)")
    return np.load(path)


@pytest.fixture(scope="session")
def golden_loader():
    return golden
