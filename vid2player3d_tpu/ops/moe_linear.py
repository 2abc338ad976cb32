"""Fused mixture-of-experts blended linear layer (Pallas TPU kernel).

The MVAE decoder (reference `vid2player/motion_vae/model.py:237-250`) applies,
per sample, a softmax-blended mixture of expert weight matrices:

    out[b] = sum_e coeff[b, e] * (x[b] @ W[e] + bias[e])

This runs at every simulation step of high-level training — batch = num_envs
(10k–30k), three layers per decode — so it is one of the hottest matmuls in
the framework after the policy MLPs.

Two naive lowerings both waste HBM bandwidth:

1. blend-then-apply (`be,eio->bio` then `bi,bio->bo`): materializes a
   per-sample (B, in, out) weight tensor — O(B·in·out) HBM traffic and
   O(E·B·in·out) FLOPs for the blend alone.
2. apply-then-blend (`bi,eio->beo` then weight by coeff): O(E·B·out)
   intermediate in HBM.

The Pallas kernel streams batch tiles through VMEM: all E expert matrices stay
resident in VMEM (E·in·out ≈ 6·304·256·4B ≈ 1.9 MB for the decoder's largest
layer), each batch tile does E MXU matmuls accumulated in a VMEM scratch
scaled by the per-sample coefficient column, and only the final (TILE_B, out)
block is written back. FLOPs = E·B·in·out with zero HBM intermediates.

Backward runs the per-expert formulation in plain jnp (XLA fuses it well; the
forward is the step-loop hot path, the backward only runs in MVAE training).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def moe_linear_ref(x, coeff, w, b):
    """Reference (pure jnp) blended-expert linear.

    x: (B, in), coeff: (B, E), w: (E, in, out), b: (E, out) -> (B, out).
    Uses the apply-then-blend formulation (optimal FLOPs: E·B·in·out).
    """
    per_expert = jnp.einsum("bi,eio->beo", x, w,
                            preferred_element_type=jnp.float32)
    out = jnp.einsum("be,beo->bo", coeff, per_expert,
                     preferred_element_type=jnp.float32)
    return (out + coeff @ b).astype(x.dtype)


def _moe_kernel(x_ref, coeff_ref, w_ref, b_ref, out_ref, acc_ref):
    """One batch tile: accumulate sum_e coeff[:, e] * (x @ W[e]) in VMEM."""
    num_experts = w_ref.shape[0]
    x = x_ref[:]
    coeff = coeff_ref[:]
    # bias term first: (TILE_B, E) @ (E, out) on the MXU
    acc_ref[:] = jnp.dot(coeff, b_ref[:], preferred_element_type=jnp.float32)
    for e in range(num_experts):  # static unroll: E is small (6)
        y = jnp.dot(x, w_ref[e], preferred_element_type=jnp.float32)
        acc_ref[:] += coeff[:, e][:, None] * y
    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _moe_linear(x, coeff, w, b, tile_b):
    batch, d_in = x.shape
    num_experts, _, d_out = w.shape
    grid = (batch // tile_b,)
    return pl.pallas_call(
        _moe_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, d_in), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, num_experts), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_experts, d_in, d_out), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_experts, d_out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, d_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, d_out), x.dtype),
        scratch_shapes=[pltpu.VMEM((tile_b, d_out), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * num_experts * batch * d_in * d_out,
            bytes_accessed=(x.size + coeff.size + w.size + b.size
                            + batch * d_out) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, coeff, w, b)


def _moe_fwd(x, coeff, w, b, tile_b):
    return _moe_linear(x, coeff, w, b, tile_b), (x, coeff, w, b)


def _moe_bwd(tile_b, res, g):
    x, coeff, w, b = res
    g32 = g.astype(jnp.float32)
    # dx[b] = sum_e coeff[b,e] * (g[b] @ W[e].T) — per-expert path, no
    # (B, out, in) intermediate
    g_per = jnp.einsum("bo,eio->bei", g32, w,
                       preferred_element_type=jnp.float32)
    dx = jnp.einsum("be,bei->bi", coeff, g_per).astype(x.dtype)
    # dW[e] = (coeff[:,e] * x).T @ g
    dw = jnp.einsum("be,bi,bo->eio", coeff, x, g32,
                    preferred_element_type=jnp.float32).astype(w.dtype)
    # dcoeff[b,e] = g[b] · (x[b] @ W[e]) + g[b] · b[e]
    per_expert = jnp.einsum("bi,eio->beo", x, w,
                            preferred_element_type=jnp.float32)
    dcoeff = (jnp.einsum("beo,bo->be", per_expert, g32)
              + g32 @ b.astype(jnp.float32).T).astype(coeff.dtype)
    db = (coeff.astype(jnp.float32).T @ g32).astype(b.dtype)
    return dx, dcoeff, dw, db


_moe_linear.defvjp(_moe_fwd, _moe_bwd)


def _on_tpu() -> bool:
    dev = jax.config.jax_default_device
    if dev is not None:
        return getattr(dev, "platform", None) == "tpu"
    return jax.default_backend() == "tpu"


def moe_linear(x, coeff, w, b, tile_b: int = 256):
    """Blended-expert linear: sum_e coeff[:, e] * (x @ w[e] + b[e]).

    Dispatches to the Pallas TPU kernel when running on TPU, padding the
    batch up to a tile multiple; otherwise (CPU tests, virtual meshes) uses
    the jnp reference which XLA fuses adequately.
    """
    if not _on_tpu():
        return moe_linear_ref(x, coeff, w, b)
    batch = x.shape[0]
    tile_b = min(tile_b, _round_up(batch, 8))
    padded = _round_up(batch, tile_b)
    if padded != batch:
        pad = padded - batch
        x = jnp.pad(x, ((0, pad), (0, 0)))
        coeff = jnp.pad(coeff, ((0, pad), (0, 0)))
    out = _moe_linear(x, coeff, w, b, tile_b)
    return out[:batch] if padded != batch else out
