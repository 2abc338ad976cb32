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
        # rally serves are lane-paired (`_post_reset` mirrors each serve into
        # its partner lane) — the candidate-pool reset breaks pairing
        assert self.cfg.reset_candidates == 0, \
            "dual mode requires reset_candidates=0 (lane-paired serves)"
        self._swap = jnp.arange(N) ^ 1
        self._lane = jnp.arange(N) % 2

    # -- task-machine overrides -------------------------------------------------

    def _init_tar_action(self, N) -> jnp.ndarray:
        # even = near player receives first; odd waits for the hand-off
        return (1 - self._lane).astype(jnp.int32)

    def _post_reset(self, state: TennisState) -> TennisState:
        """Rally opening = a synthesized serve from the recovery (odd) lane:
        the server's ball launches from their racket with a random serve
        velocity and the receiving (even) lane gets the mirrored incoming
        flight (`humanoid_smpl_im_mvae_dual.py:52-63` sets the recovery
        player's ball at their racket pos with vel x∈[-2,2], y∈[28,32],
        z∈[5,8] and serve spin, then hands the in-estimate to the opponent)."""
        import dataclasses

        import jax

        N = self.cfg.num_envs
        key = jax.random.fold_in(state.key, 77)
        k1, k2, k3 = jax.random.split(key, 3)
        receiving = (self._lane == 0)

        vx = jax.random.uniform(k1, (N,), minval=-2.0, maxval=2.0)
        vy = jax.random.uniform(k2, (N,), minval=28.0, maxval=32.0)
        vz = jax.random.uniform(k3, (N,), minval=5.0, maxval=8.0)
        serve_vel = jnp.stack([vx, vy, vz], axis=-1)
        serve_pos = state.racket_pos
        vspin = jnp.full((N,), 40.0 / (2 * jnp.pi))  # ang vel 40 rad/s topspin

        # each lane's serve, mirrored into ITS OPPONENT's frame, is that
        # opponent's incoming ball; gather via the lane-swap
        mir = jnp.array([-1.0, -1.0, 1.0])
        pos_in = (serve_pos * mir)[self._swap]
        vel_in = (serve_vel * mir)[self._swap]
        vspin_in = vspin[self._swap]
        T = state.ball_traj.shape[1]
        res = B.simulate_flight(pos_in, vel_in, vspin_in, num_frames=T,
                                p=self.ball_params)

        r = receiving[:, None]
        return dataclasses.replace(
            state,
            # receiver: mirrored incoming serve; server: own outgoing ball
            ball_pos=jnp.where(r, pos_in, serve_pos),
            ball_vel=jnp.where(r, vel_in, serve_vel),
            ball_vspin=jnp.where(receiving, vspin_in, vspin),
            ball_traj=jnp.where(r[..., None], res.traj, state.ball_traj))

    def _reaction_trigger(self, state: TennisState, tar_time,
                          contact_now) -> jnp.ndarray:
        # my reaction = opponent just hit (NOT a timer)
        return contact_now[self._swap]

    def _reaction_ball(self, state: TennisState, key, ball_state13,
                       reaction_mask):
        """Opponent's outgoing ball, mirrored into my court frame and flown
        forward into the full incoming trajectory. Computed unconditionally:
        at training scale some pair hands off nearly every step, so a
        `lax.cond` on any(reaction_mask) would always take the live branch
        while adding a cross-shard all-reduce under SPMD.

        `ok` = the re-simulated flight clears the net — a netted shot must
        end the rally under every reward/termination config, not only the
        `return_w_estimate` est_bounce_in path (the flight model has no net
        collision, so an ungated hand-off would tunnel through)."""
        partner = ball_state13[self._swap]
        # size the hand-off to the live trajectory window, which comes from
        # the generator's traj length (may differ from ball_traj_pool_len)
        T = state.ball_traj.shape[1]
        pos, vel, vspin = B._state_to_launch(partner)
        mir = jnp.array([-1.0, -1.0, 1.0], pos.dtype)
        pos_in = pos * mir
        vel_in = vel * mir
        res = B.simulate_flight(pos_in, vel_in, vspin, num_frames=T,
                                p=self.ball_params)
        return res.traj, pos_in, vel_in, vspin, res.pass_net

    def _couple_done(self, terminate, done):
        # rally ends for both lanes together
        return (terminate | terminate[self._swap],
                done | done[self._swap])
