"""Dual-player rally environment — two coupled tennis players.

TPU-native re-design of the reference's rally mode
(`vid2player/env/tasks/physics_mvae_controller_dual.py` +
`humanoid_smpl_im_mvae_dual.py`): envs are PAIRED lanes — even lane = near
player, odd lane = far player. Each lane simulates its own humanoid in its own
near-side court frame; the opponent's world is the mirror image through the
net. Rally coupling, mirrored per reference line:

- even lanes start in reaction (receiving the serve), odd lanes in recovery
  (`physics_mvae_controller_dual.py:28-47` serve-from handling);
- a player's hit (recovery transition) marks the REACTION of the opponent
  lane (`:108-110`): the outgoing ball state is mirrored through the net and
  re-simulated into the opponent's incoming 30 Hz trajectory — the fused
  equivalent of the `TennisBallInEstimator` lookup
  (`humanoid_smpl_im_mvae_dual.py:52-81`, `tennis_ball_in_estimator.py:49-79`);
- the rally terminates for BOTH lanes when either misses / goes out
  (`physics_mvae_controller_dual.py:112-121`).

Unlike the reference — which runs two interleaved Isaac envs and pushes
mirrored root-state tensors between them on the host — both lanes live in one
jitted step: the hand-off is a `ball_state13[lane ^ 1]` gather plus a masked
flight re-simulation under `lax.cond`, so rallies of any length never leave
the device.

The per-lane policies (one per player identity) are routed by lane parity in
the learner (`V2PPPO(num_policies=2)`, reference
`v2p_network_builder_dual.py:39-57`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..tennis import ball as B
from .tennis import TennisEnv, TennisState


class DualTennisEnv(TennisEnv):
    """Paired-lane rally env. Requires an even `num_envs`; lane i's opponent
    is lane i ^ 1."""

    def __init__(self, *args, **kw):
        super().__init__(*args, **kw)
        N = self.cfg.num_envs
        assert N % 2 == 0, "dual mode pairs envs: num_envs must be even"
        self._swap = jnp.arange(N) ^ 1
        self._lane = jnp.arange(N) % 2

    # -- task-machine overrides -------------------------------------------------

    def _init_tar_action(self, N) -> jnp.ndarray:
        # even = near player receives first; odd waits for the hand-off
        return (1 - self._lane).astype(jnp.int32)

    def _post_reset(self, state: TennisState) -> TennisState:
        """Park the recovery (odd) lane's ball out of play, receding, so the
        miss/ball-passed logic can never fire before the first hand-off."""
        import dataclasses

        N = self.cfg.num_envs
        waiting = (self._lane == 1)
        park_pos = jnp.array([0.0, 30.0, 1.0])
        park_vel = jnp.array([0.0, 5.0, 0.0])
        w = waiting[:, None]
        return dataclasses.replace(
            state,
            ball_pos=jnp.where(w, park_pos, state.ball_pos),
            ball_vel=jnp.where(w, park_vel, state.ball_vel),
            ball_vspin=jnp.where(waiting, 0.0, state.ball_vspin),
            ball_traj=jnp.where(waiting[:, None, None], park_pos,
                                state.ball_traj))

    def _reaction_trigger(self, state: TennisState, tar_time,
                          contact_now) -> jnp.ndarray:
        # my reaction = opponent just hit (NOT a timer)
        return contact_now[self._swap]

    def _reaction_ball(self, state: TennisState, key, ball_state13,
                       reaction_mask):
        """Opponent's outgoing ball, mirrored into my court frame and flown
        forward into the full incoming trajectory. Gated by `lax.cond` so the
        flight re-simulation costs nothing on the (vast majority of) steps
        with no hand-off."""
        cfg = self.cfg
        N = cfg.num_envs
        partner = ball_state13[self._swap]
        T = cfg.ball_traj_pool_len

        def live(_):
            pos, vel, vspin = B._state_to_launch(partner)
            mir = jnp.array([-1.0, -1.0, 1.0], pos.dtype)
            pos_in = pos * mir
            vel_in = vel * mir
            res = B.simulate_flight(pos_in, vel_in, vspin, num_frames=T,
                                    p=self.ball_params)
            return res.traj, pos_in, vel_in, vspin

        def dead(_):
            return (jnp.zeros((N, T, 3)), jnp.zeros((N, 3)),
                    jnp.zeros((N, 3)), jnp.zeros(N))

        return jax.lax.cond(jnp.any(reaction_mask), live, dead, None)

    def _couple_done(self, terminate, done):
        # rally ends for both lanes together
        return (terminate | terminate[self._swap],
                done | done[self._swap])
