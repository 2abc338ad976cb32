"""Fused clip+Adam+apply as a single Pallas TPU kernel per parameter leaf.

The PPO update phase runs thousands of SEQUENTIAL minibatch optimizer steps
per epoch (amass_im: 512 minibatches x 6 mini-epochs — reference
`learning/common_agent.py:388-395` steps Adam once per minibatch). Each step
is HBM-bound on parameter/moment traffic, so the speed-of-light is ONE
read-modify-write pass over (params, mu, nu, grads). The optax chain
(`clip_by_global_norm` -> `scale_by_adam` -> scale(-lr) -> `apply_updates`)
leaves XLA several chances to materialize intermediates (scaled grads, the
update tree); this kernel performs

    g'   = clip_scale * g
    mu'  = b1*mu + (1-b1)*g'          (bf16 storage, f32 arithmetic)
    nu'  = b2*nu + (1-b2)*g'^2
    p'   = p - lr * (mu'/c1) / (sqrt(nu'/c2) + eps)

in one VMEM pass with input/output aliasing (in-place p/mu/nu), matching
`optim.scale_by_adam_lowmem` + clip + apply semantics bit-for-bit in f32
arithmetic. The global-norm reduction stays a separate (unavoidable) pass
over the grads.

Leaves whose size is not lane-aligned (or tiny) fall back to plain jnp —
padding copies would cost more than they save.
"""

from __future__ import annotations

import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax

_LANES = 128
_BLOCK_ROWS = 1024          # (1024, 128) f32 block = 512 KiB per buffer


def _on_tpu() -> bool:
    try:
        dev = jax.config.jax_default_device
        if dev is not None:
            return dev.platform == "tpu"
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _kernel(b1, b2, eps, s_ref, p_ref, m_ref, v_ref, g_ref,
            po_ref, mo_ref, vo_ref):
    clip_scale = s_ref[0]
    lr = s_ref[1]
    c1 = s_ref[2]
    c2 = s_ref[3]
    g = g_ref[...].astype(jnp.float32) * clip_scale
    m = b1 * m_ref[...].astype(jnp.float32) + (1.0 - b1) * g
    v = b2 * v_ref[...].astype(jnp.float32) + (1.0 - b2) * g * g
    step = (m / c1) / (jnp.sqrt(v / c2) + eps)
    p = p_ref[...].astype(jnp.float32) - lr * step
    po_ref[...] = p.astype(po_ref.dtype)
    mo_ref[...] = m.astype(mo_ref.dtype)
    vo_ref[...] = v.astype(vo_ref.dtype)


@functools.partial(jax.jit, static_argnames=("b1", "b2", "eps", "interpret"))
def _leaf_pallas(p, m, v, g, scalars, b1=0.9, b2=0.999, eps=1e-8,
                 interpret=False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = p.size
    rows = n // _LANES
    shape2 = (rows, _LANES)
    p2, m2, v2, g2 = (x.reshape(shape2) for x in (p, m, v, g))
    br = min(rows, _BLOCK_ROWS)
    grid = (pl.cdiv(rows, br),)
    tile = pl.BlockSpec((br, _LANES), lambda i: (i, 0))
    out = pl.pallas_call(
        functools.partial(_kernel, b1, b2, eps),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  tile, tile, tile, tile],
        out_specs=[tile, tile, tile],
        out_shape=[jax.ShapeDtypeStruct(shape2, p.dtype),
                   jax.ShapeDtypeStruct(shape2, m.dtype),
                   jax.ShapeDtypeStruct(shape2, v.dtype)],
        input_output_aliases={1: 0, 2: 1, 3: 2},
        interpret=interpret,
    )(scalars, p2, m2, v2, g2)
    return tuple(o.reshape(p.shape) for o in out)


def _leaf_plain(p, m, v, g, scalars, b1=0.9, b2=0.999, eps=1e-8):
    clip_scale, lr, c1, c2 = scalars[0], scalars[1], scalars[2], scalars[3]
    g32 = g.astype(jnp.float32) * clip_scale
    m32 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g32
    v32 = b2 * v.astype(jnp.float32) + (1.0 - b2) * g32 * g32
    step = (m32 / c1) / (jnp.sqrt(v32 / c2) + eps)
    return (p - (lr * step).astype(p.dtype), m32.astype(m.dtype),
            v32.astype(v.dtype))


def fused_clip_adam_apply(params: Any, opt_state: optax.ScaleByAdamState,
                          grads: Any, lr, max_norm: float,
                          b1: float = 0.9, b2: float = 0.999,
                          eps: float = 1e-8, use_pallas: bool | None = None,
                          interpret: bool = False
                          ) -> Tuple[Any, optax.ScaleByAdamState]:
    """One fused optimizer step. Drop-in for
    `clip_by_global_norm(max_norm)` -> `scale_by_adam` -> `p -= lr*step`.

    `opt_state` is an `optax.ScaleByAdamState` (as produced by
    `optim.scale_by_adam_lowmem` / `optax.scale_by_adam`)."""
    if use_pallas is None:
        use_pallas = _on_tpu() or interpret
    if use_pallas and not _on_tpu():
        interpret = True    # Pallas has no native CPU lowering

    leaves, treedef = jax.tree_util.tree_flatten(params)
    g_leaves = treedef.flatten_up_to(grads)
    m_leaves = treedef.flatten_up_to(opt_state.mu)
    v_leaves = treedef.flatten_up_to(opt_state.nu)

    gnorm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                         for g in g_leaves))
    # optax.clip_by_global_norm semantics: scale only when above max_norm
    clip_scale = jnp.minimum(1.0, max_norm / jnp.maximum(gnorm, 1e-12))
    count = opt_state.count + 1
    c1 = 1.0 - b1 ** count.astype(jnp.float32)
    c2 = 1.0 - b2 ** count.astype(jnp.float32)
    scalars = jnp.stack([clip_scale.astype(jnp.float32),
                         jnp.asarray(lr, jnp.float32), c1, c2])

    new_p, new_m, new_v = [], [], []
    for p, g, m, v in zip(leaves, g_leaves, m_leaves, v_leaves):
        aligned = (p.size % _LANES == 0) and (p.size >= 8 * _LANES)
        if use_pallas and aligned:
            o = _leaf_pallas(p, m, v, g, scalars, b1=b1, b2=b2, eps=eps,
                             interpret=interpret)
        else:
            o = _leaf_plain(p, m, v, g, scalars, b1=b1, b2=b2, eps=eps)
        new_p.append(o[0])
        new_m.append(o[1])
        new_v.append(o[2])

    unflat = jax.tree_util.tree_unflatten
    return unflat(treedef, new_p), optax.ScaleByAdamState(
        count=count, mu=unflat(treedef, new_m), nu=unflat(treedef, new_v))
