"""Pallas TPU kernels for hot ops.

The compute path of this framework is almost entirely XLA-fused jnp; these
kernels cover the spots where XLA's default lowering leaves bandwidth or
memory on the table (SURVEY.md §7 "Pallas kernels for the hot ops").
"""

from vid2player3d_tpu.ops.moe_linear import moe_linear, moe_linear_ref

__all__ = ["moe_linear", "moe_linear_ref"]
