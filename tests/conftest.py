"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The container's sitecustomize imports jax and registers the remote-TPU (axon)
backend at interpreter boot, so JAX_PLATFORMS env vars set here are too late;
instead we flip the already-imported jax config to CPU before any backend is
instantiated. Tests exercise sharding on 8 virtual CPU devices; real-TPU
execution is covered by bench.py and __graft_entry__.entry().
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (multi-process spawn etc.)")


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert len(devs) == 8 and devs[0].platform == "cpu"
    return devs
