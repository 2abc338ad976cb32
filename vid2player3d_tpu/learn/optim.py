"""Low-memory Adam for the PPO update scan.

The reference-parity update phase runs thousands of SEQUENTIAL minibatch-512
gradient steps per epoch (amass_im: 512 minibatches x 6 mini-epochs), so on
TPU the scan body is HBM-bound on optimizer-state traffic: full-precision
Adam reads+writes 2 x 4 bytes/param of moments every step. This transform
stores BOTH moments in a compact dtype (bfloat16 — same exponent range as
f32, ~0.4% relative error on the step size) while doing all arithmetic and
bias correction in f32. Matches `optax.scale_by_adam` semantics otherwise
(optax 0.2.6 exposes `mu_dtype` but not `nu_dtype`, hence this transform).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def scale_by_adam_lowmem(b1: float = 0.9, b2: float = 0.999,
                         eps: float = 1e-8,
                         state_dtype=jnp.bfloat16) -> optax.GradientTransformation:
    def init_fn(params):
        mu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=state_dtype), params)
        nu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=state_dtype), params)
        return optax.ScaleByAdamState(count=jnp.zeros([], jnp.int32),
                                      mu=mu, nu=nu)

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        def upd(g, m, v):
            g32 = g.astype(jnp.float32)
            m32 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g32
            v32 = b2 * v.astype(jnp.float32) + (1.0 - b2) * g32 * g32
            step = (m32 / c1) / (jnp.sqrt(v32 / c2) + eps)
            return step.astype(g.dtype), m32.astype(state_dtype), \
                v32.astype(state_dtype)

        out = jax.tree_util.tree_map(upd, updates, state.mu, state.nu)
        steps = jax.tree_util.tree_map(lambda t: t[0], out,
                                       is_leaf=lambda t: isinstance(t, tuple))
        mu = jax.tree_util.tree_map(lambda t: t[1], out,
                                    is_leaf=lambda t: isinstance(t, tuple))
        nu = jax.tree_util.tree_map(lambda t: t[2], out,
                                    is_leaf=lambda t: isinstance(t, tuple))
        return steps, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)
