"""Frozen low-level imitation policy for embedding inside the tennis env.

TPU-native replacement for the reference's nested rl_games player: the
reference builds a COMPLETE inner test player around the physics task and
restores the trained low-level checkpoint into it
(`vid2player/env/utils/player_builder.py:184-206`), then calls
`ImitatorPlayer.run_one_step` — read obs, deterministic action, task.step —
every controller frame (`vid2player/players/im_player.py:187-202`).

Here the frozen policy is just a pure function + a params pytree handed to
`TennisEnv(pi_low=..., pi_low_params=...)`; the policy forward fuses into the
same jitted device step as the MVAE decode, FK, PD control and physics —
the player-inside-env indirection disappears (SURVEY.md §7 deltas).

The embedded net mirrors the vid2player copy of the imitator network
(`vid2player/models/im_network_builder.py`): running-obs normalization + MLP,
deterministic mu at test time. Actions are RESIDUALS around the kinematic
target dof (the residual-action head `mu += target_dof`,
`embodied_pose/models/im_network_builder.py:226-229`, with the target dof
supplied by the MVAE kinematic pose in the tennis stack), plus the 6-dim
residual root force/torque tail.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from ..envs.obs import IMITATION_OBS_DIM
from . import running_norm as RN
from .networks import ImitatorNet


@dataclasses.dataclass
class FrozenImitator:
    """A trained imitation policy packaged for embedding: network statics +
    a params pytree (weights + frozen obs normalizer)."""

    net: ImitatorNet
    params: Any
    obs_norm: RN.RunningNormState
    obs_clip: float = 5.0

    @classmethod
    def from_checkpoint(cls, path: str, num_actions: int = 75,
                        obs_dim: int = IMITATION_OBS_DIM) -> "FrozenImitator":
        """Load an `ImitationPPO.save_checkpoint` npz (params + running
        stats) — the analog of `PlayerBuilder` restoring the low-level
        checkpoint (`player_builder.py:184-206`)."""
        from ..utils import checkpoint as CK

        net = ImitatorNet(num_actions=num_actions)
        like_params = net.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, obs_dim)))
        like = {"params": like_params,
                "obs_norm": RN.RunningNormState.create(obs_dim)}
        try:
            loaded = CK.load_pytree(path, like)
        except KeyError:
            # context-IK checkpoints nest the actor-critic under params/ac
            # (the ctx heads are train-time machinery; the embedded policy
            # only needs the actor — like the reference's simplified
            # vid2player im net, `vid2player/models/im_network_builder.py`)
            like = {"params": {"ac": like_params},
                    "obs_norm": RN.RunningNormState.create(obs_dim)}
            loaded = CK.load_pytree(path, like)
            loaded["params"] = loaded["params"]["ac"]
        return cls(net=net, params=loaded["params"],
                   obs_norm=loaded["obs_norm"])

    @classmethod
    def zeros(cls, num_actions: int = 75, obs_dim: int = IMITATION_OBS_DIM
              ) -> "FrozenImitator":
        """All-zero policy: residual action 0, so the tennis env's physics
        tracks the kinematic targets exactly like the PD-only fallback —
        used to validate the wiring."""
        net = ImitatorNet(num_actions=num_actions)
        params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, obs_dim)))
        params = jax.tree_util.tree_map(jnp.zeros_like, params)
        return cls(net=net, params=params,
                   obs_norm=RN.RunningNormState.create(obs_dim))

    def as_pi_low(self) -> Tuple[Callable, Dict[str, Any]]:
        """(pi_low, pi_low_params) for `TennisEnv`: pi_low(params, obs_734)
        → deterministic residual action (N, num_actions)."""
        net = self.net
        clip = self.obs_clip

        def apply(p, obs):
            obs_n = RN.normalize(p["obs_norm"], obs, clip)
            mu, _ = net.apply(p["params"], obs_n)
            return mu

        return apply, {"params": self.params, "obs_norm": self.obs_norm}
