"""Actor-critic networks (flax) replacing rl_games network builders.

`ImitatorNet` = the reference's `ImitatorBuilder` network body
(`embodied_pose/models/im_network_builder.py`): separate actor/critic MLPs
[1024,1024,512] over the 734-dim imitation obs, continuous mu head with fixed
log-sigma, residual action (mu += target dof) applied by the caller.
`V2PNet` = the high-level `V2PBuilder` (`vid2player/models/v2p_network_builder.py`).
Compute in bfloat16 on the MXU with f32 params/outputs.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class MLP(nn.Module):
    units: Sequence[int]
    activation: Callable = nn.relu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for u in self.units:
            x = nn.Dense(u, dtype=self.dtype)(x)
            x = self.activation(x)
        return x


class ActorCritic(nn.Module):
    """Separate actor/critic MLP trunks + mu/value heads.

    The mu head is small-init (σ scaled by `head_init_scale` relative to
    lecun): the action is a RESIDUAL around the kinematic/reference target
    (`im_network_builder.py:226-229` mu += target dof), so the policy must
    START at the pure-PD behavior — a default-init head emits ~1-rad random
    dof residuals and ~30 N random root forces (≈6σ of the exploration
    noise e^-1.756), which both destroys the early rollouts and produces a
    first-epoch KL so large that the adaptive LR schedule collapses to
    min_lr before any learning happens."""

    num_actions: int
    actor_units: Sequence[int] = (1024, 1024, 512)
    critic_units: Sequence[int] = (1024, 1024, 512)
    dtype: jnp.dtype = jnp.float32
    head_init_scale: float = 0.01

    @nn.compact
    def __call__(self, obs) -> Tuple[jnp.ndarray, jnp.ndarray]:
        head_init = nn.initializers.variance_scaling(
            self.head_init_scale ** 2, "fan_in", "truncated_normal")
        a = MLP(self.actor_units, dtype=self.dtype, name="actor_mlp")(obs)
        mu = nn.Dense(self.num_actions, dtype=jnp.float32,
                      kernel_init=head_init, name="mu")(a)
        c = MLP(self.critic_units, dtype=self.dtype, name="critic_mlp")(obs)
        value = nn.Dense(1, dtype=jnp.float32, kernel_init=head_init,
                         name="value")(c)
        return mu, value[..., 0]


class ContextHeads(nn.Module):
    """Context encoder for the corrupted-context IK pipeline
    (`embodied_pose/models/im_network_builder.py:78-115 perform_ik`): consumes
    the (possibly corrupted) root-relative context joint positions + the
    per-joint confidence channel and predicts the twist residuals (phis,
    23×2) and leaf-rotation residuals (5×rot6d) that parameterize the
    analytic IK. Outputs are zero-initialized so training starts from the
    identity-twist IK solution."""

    units: Sequence[int] = (256, 128)

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = MLP(self.units, name="ctx_mlp")(x)
        phis = nn.Dense(46, kernel_init=nn.initializers.zeros,
                        name="phis")(h)
        leaf6d = nn.Dense(30, kernel_init=nn.initializers.zeros,
                          name="leaf6d")(h)
        return phis, leaf6d


# aliases documenting the correspondence to the reference builders
ImitatorNet = ActorCritic   # im_network_builder.py ImitatorBuilder.Network
V2PNet = ActorCritic        # v2p_network_builder.py V2PBuilder.Network
