"""Runtime/platform helpers shared across learners, kernels, CLIs, benches."""

from __future__ import annotations

import os


def default_platform() -> str:
    """Platform of the default DEVICE, not default_backend(): a session can
    pin jax_default_device to CPU while a TPU plugin (platform "axon" in
    this image) is still the highest-priority backend."""
    import jax

    dev = jax.config.jax_default_device
    return dev.platform if dev is not None else jax.default_backend()


def on_cpu() -> bool:
    return default_platform() == "cpu"


def enable_compile_cache(path: str | None = None) -> None:
    """Persistent compilation cache (the env var is not honored by this jax
    build — it must go through jax.config)."""
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        path or os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
