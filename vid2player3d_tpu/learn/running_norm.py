"""Running mean/std normalizers as explicit functional state.

Matches the reference's `RunningNorm` (`embodied_pose/models/running_norm.py`):
    w = n/(n+m);  var ← w·var + (1−w)·var_x + w(1−w)(mean_x−mean)²
    y = clip((x − mean)/(std + 1e-8), ±clip)
Used both for observation filtering (`use_running_obs: ours`) and value
normalization (`normalize_value`). State is a pytree; updates are pure.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class RunningNormState:
    n: jnp.ndarray      # scalar count
    mean: jnp.ndarray   # (D,)
    var: jnp.ndarray    # (D,)

    def tree_flatten(self):
        return (self.n, self.mean, self.var), ()

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch)

    @classmethod
    def create(cls, dim: int):
        return cls(n=jnp.zeros((), jnp.float32), mean=jnp.zeros(dim),
                   var=jnp.zeros(dim))


def update(state: RunningNormState, x: jnp.ndarray) -> RunningNormState:
    """Merge a batch (B, D) into the running stats (Welford batch merge)."""
    x = x.reshape(-1, x.shape[-1])
    m = x.shape[0]
    mean_x = jnp.mean(x, axis=0)
    var_x = jnp.var(x, axis=0)
    w = state.n / (state.n + m)
    var = w * state.var + (1 - w) * var_x + w * (1 - w) * (mean_x - state.mean) ** 2
    mean = w * state.mean + (1 - w) * mean_x
    return RunningNormState(n=state.n + m, mean=mean, var=var)


def normalize(state: RunningNormState, x, clip: float = 5.0):
    std = jnp.sqrt(state.var)
    y = (x - state.mean) / (std + 1e-8)
    if clip:
        y = jnp.clip(y, -clip, clip)
    return jnp.where(state.n > 0, y, x)


def unnormalize_value(state: RunningNormState, y):
    """Inverse transform for value heads (rl_games RunningMeanStd semantics)."""
    std = jnp.sqrt(state.var)
    return jnp.where(state.n > 0, y * (std + 1e-8) + state.mean, y)


def normalize_value(state: RunningNormState, x):
    std = jnp.sqrt(state.var)
    return jnp.where(state.n > 0, (x - state.mean) / (std + 1e-8), x)
