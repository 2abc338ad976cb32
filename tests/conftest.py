"""Test configuration: run everything on a virtual 8-device CPU mesh.

The outer environment pins JAX to the TPU plugin ('axon') and that registration
cannot be disabled via JAX_PLATFORMS — so instead we set the default device to
CPU after init and build explicit CPU meshes. As long as no array touches the
TPU backend, tests never pay the tunnel handshake.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The persistent compilation cache must be enabled via jax.config (the
# JAX_COMPILATION_CACHE_DIR env var is not honored by this jax build). The
# physics step compiles in O(minutes) on CPU; the cache makes reruns instant.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

_CPUS = jax.devices("cpu")
jax.config.update("jax_default_device", _CPUS[0])
# kinematic chains and small physics matmuls need f32 accumulation
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_addoption(parser):
    parser.addoption("--regen-golden", action="store_true", default=False,
                     help="rewrite golden regression files from this run")
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run tests marked @pytest.mark.slow "
                          "(multi-minute compiles / training loops)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: compile-heavy or training-loop test; excluded from the "
        "default fast tier, run with --runslow (or RUN_SLOW=1)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow (or RUN_SLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def cpu_devices():
    return _CPUS


@pytest.fixture(scope="session")
def cpu_mesh():
    from jax.sharding import Mesh

    return Mesh(np.array(_CPUS).reshape(len(_CPUS)), ("data",))
