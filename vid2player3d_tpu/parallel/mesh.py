"""Mesh construction and pytree placement helpers for SPMD data parallelism."""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def initialize_distributed() -> None:
    """Multi-host init: connect this process to the jax.distributed cluster.

    No-op when the coordinator env vars are absent (single-host runs, CPU test
    meshes). Replaces the reference's `hvd.init()` + per-rank device pinning
    (`embodied_pose/run.py:29-44`); after this, `jax.devices()` spans the pod
    and a single mesh covers all chips.
    """
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
            "COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def data_parallel_mesh(n_devices: Optional[int] = None,
                       axis: str = "data",
                       devices: Optional[Sequence[Any]] = None) -> Mesh:
    """1-D mesh over `n_devices` (default: all) named `axis`.

    Env count and rollout buffers shard along this axis; params/optimizer
    state replicate. For a pod slice the device order from `jax.devices()`
    already follows the ICI torus, so nearest-neighbor collectives ride ICI.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            # driver/test setups expose virtual CPU devices alongside one
            # real chip — fall back to the CPU platform for the mesh
            devices = jax.devices("cpu")
        devices = devices[:n_devices]
        assert len(devices) == n_devices, \
            f"need {n_devices} devices, have {len(devices)}"
    return Mesh(np.array(devices), (axis,))


def shard_leading_axis(tree: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Place every array leaf with its leading dim partitioned over `axis`
    (scalars replicate). Use for per-env model arrays and rollout batches."""

    n = int(np.prod([s for name, s in zip(mesh.axis_names, mesh.devices.shape)
                     if name == axis]) or 1)

    def put(x):
        x = jax.numpy.asarray(x)
        if x.ndim == 0 or x.shape[0] % n != 0:
            # scalars and non-divisible leaves (shared tables) replicate
            return jax.device_put(x, NamedSharding(mesh, PartitionSpec()))
        spec = PartitionSpec(*((axis,) + (None,) * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Place every leaf fully replicated over the mesh (params, shared
    tables like the motion library and estimator grids)."""

    def put(x):
        return jax.device_put(jax.numpy.asarray(x),
                              NamedSharding(mesh, PartitionSpec()))

    return jax.tree_util.tree_map(put, tree)


def cross_shard_mean(tree: Any, axis: str = "data") -> Any:
    """Mean-reduce leaves across the mesh axis — for use *inside* shard_map
    regions (explicit-collective style). Under plain jit+GSPMD, reductions
    like `x.mean()` already produce the equivalent psum; this helper exists
    for hand-partitioned code paths."""
    return jax.tree_util.tree_map(lambda x: jax.lax.pmean(x, axis), tree)
