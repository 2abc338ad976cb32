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
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

_CPUS = jax.devices("cpu")
jax.config.update("jax_default_device", _CPUS[0])
# kinematic chains and small physics matmuls need f32 accumulation
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(scope="session")
def cpu_devices():
    return _CPUS


@pytest.fixture(scope="session")
def cpu_mesh():
    from jax.sharding import Mesh

    return Mesh(np.array(_CPUS).reshape(len(_CPUS)), ("data",))
