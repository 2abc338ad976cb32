"""Device-mesh sharding utilities — the TPU-native replacement for the
reference's Horovod/NCCL data parallelism (SURVEY.md §2.7, §5.8).

The reference runs one simulator + agent per GPU rank and allreduces
gradients/stats over NCCL (`embodied_pose/run.py:29-44`,
`learning/common_agent.py:178-204`). Here there is a single SPMD program: the
env axis is laid out `P('data')` over a `jax.sharding.Mesh`, every jitted
step/rollout/epoch partitions automatically, and XLA inserts `psum`-style
collectives over ICI only where scalar reductions demand them.

Key rule encoded by these helpers: per-env arrays must enter jitted programs
as *arguments* — XLA ignores shardings of closure-captured constants and would
silently replicate all compute.
"""

from vid2player3d_tpu.parallel.mesh import (
    cross_shard_mean,
    data_parallel_mesh,
    initialize_distributed,
    replicate,
    shard_leading_axis,
)

__all__ = [
    "data_parallel_mesh",
    "shard_leading_axis",
    "replicate",
    "cross_shard_mean",
    "initialize_distributed",
]
