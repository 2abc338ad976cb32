"""Humanoid motion-imitation environment (TPU-native `HumanoidSMPLIM`).

Replaces `/root/reference/embodied_pose/env/tasks/humanoid_smpl_im.py` with a
functional fixed-shape design: one jitted
    step(env_state, action, key) -> (env_state, StepOutput)
that fuses PD control, the articulation substeps, motion-lib target lookup,
reward, and termination into a single XLA program. Resets are full-batch
(`reset_all`) as in the reference training loop, where all envs re-initialize at
the start of each 32-step rollout segment (`im_agent.py:305-312`) and finished
envs are alive-masked rather than re-spawned mid-rollout.

Semantics mirrored from the reference (file:line cited inline): reference-state
init with time truncation, per-step target tracking, exp-of-error imitation
reward (k=60/0.2/100/40, w=0.6/0.1/0.2/0.1, `humanoid_smpl_im.py:682,918-953`),
residual root force/torque in the heading frame (`:141-154`), head-height
termination + motion-end reset (`:956-987`), 32+2·8-frame motion context
(`:530-563`).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import quat as Q
from ..core import smpl as S
from ..data import motion_lib as ML
from ..physics import asset, engine
from ..physics.model import ArticulationModel, ArticulationState, ContactParams
from . import corrupt, domain_rand
from .obs import compute_imitation_obs, dof_to_obs


@dataclasses.dataclass(frozen=True)
class HumanoidImConfig:
    num_envs: int = 64
    control_dt: float = 1.0 / 30.0          # SIM_TIMESTEP 1/60 × controlFrequencyInv 2
    substeps: int = 8                       # physics substeps per control step
    max_episode_length: int = 300
    state_init: str = "Hybrid"             # Default | Start | Random | Hybrid
    hybrid_init_prob: float = 1.0
    context_length: int = 32
    context_padding: int = 8
    truncate_time: bool = True
    residual_force_scale: float = 31.85
    residual_torque_scale: Optional[float] = None
    pd_tar_lim: float = 0.5 * np.pi
    termination_body_height: float = -0.5
    termination_head_height: float = 1.0
    enable_early_termination: bool = True
    ground_tolerance: float = 0.0
    key_bodies: Tuple[str, ...] = ("R_Ankle", "L_Ankle", "L_Hand", "R_Hand")
    contact_bodies: Tuple[str, ...] = ("R_Ankle", "L_Ankle")
    reward_specs: Tuple[Tuple[str, float], ...] = (
        ("k_dof", 60.0), ("k_vel", 0.2), ("k_pos", 100.0), ("k_rot", 40.0),
        ("w_dof", 0.6), ("w_vel", 0.1), ("w_pos", 0.2), ("w_rot", 0.1))
    # context corruption (`humanoid_smpl_im.py:565-592`); None = clean context
    transform_specs: Optional["corrupt.TransformSpecs"] = None
    # domain randomization (`base_task.py:250-445`); None = off. Model
    # perturbations re-draw per epoch in the learner (the fused analog of
    # the reference's reset-path randomization), obs/action noise per step.
    rand_specs: Optional[Tuple["domain_rand.RandSpec", ...]] = None
    # humanoid self-collision (reference PhysX filter bitmasks,
    # `humanoid_smpl_im_mvae.py:388-417`): curated sphere-pair penalty
    # contacts so limbs deflect off the trunk instead of passing through
    self_collision: bool = True

    @property
    def res_torque_scale(self) -> float:
        return self.residual_torque_scale if self.residual_torque_scale is not None \
            else self.residual_force_scale

    @property
    def num_actions(self) -> int:
        return 69 + (6 if self.residual_force_scale > 0 else 0)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class EnvState:
    sim: ArticulationState
    progress: jnp.ndarray       # (N,) int32
    reset_buf: jnp.ndarray      # (N,) int32, latched done
    terminate_buf: jnp.ndarray  # (N,) int32
    motion_times: jnp.ndarray   # (N,) current reference time

    def tree_flatten(self):
        return (self.sim, self.progress, self.reset_buf, self.terminate_buf,
                self.motion_times), ()

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class StepOutput:
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    terminate: jnp.ndarray
    sub_rewards: jnp.ndarray

    def tree_flatten(self):
        return (self.obs, self.reward, self.done, self.terminate, self.sub_rewards), ()

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch)


class HumanoidImEnv:
    """Host-side wrapper owning static config, the articulation model, and the
    motion library; all step/reset logic is pure and jittable."""

    def __init__(self, cfg: HumanoidImConfig, lib: ML.MotionLib,
                 smpl_model: Optional[S.SMPLModel] = None,
                 motion_ids: Optional[np.ndarray] = None,
                 contact_params: ContactParams = ContactParams(),
                 rng: int = 0):
        self.cfg = cfg
        self.lib = lib
        self.smpl = smpl_model if smpl_model is not None else S.make_synthetic_smpl()
        self.contact_params = contact_params

        # per-env motion assignment, fixed at construction (`humanoid_smpl_im.py:247-253`)
        if motion_ids is None:
            key = jax.random.PRNGKey(rng)
            motion_ids = np.asarray(ML.sample_motions(lib, key, cfg.num_envs))
        self.motion_ids = jnp.asarray(motion_ids, dtype=jnp.int32)

        # per-env body model from each motion's betas (gender+betas → shape)
        bodies = np.asarray(lib.motion_bodies)[np.asarray(motion_ids)]
        scales = np.asarray(lib.motion_body_scales)[np.asarray(motion_ids)]
        self.motion_bodies = jnp.asarray(bodies)
        self.model = asset.build_humanoid_model(
            self.smpl, bodies[:, 1:11], scale=scales,
            self_collision=cfg.self_collision)

        names = S.MUJOCO_JOINT_NAMES
        self.head_id = names.index("Head")
        self.key_body_ids = np.array([names.index(n) for n in cfg.key_bodies])
        self.contact_body_ids = np.array([names.index(n) for n in cfg.contact_bodies])

        # termination heights (`humanoid_smpl_im.py:217-223`)
        th = np.full(24, cfg.termination_body_height, dtype=np.float32)
        th[self.head_id] = max(cfg.termination_head_height, th[self.head_id])
        self.termination_heights = jnp.asarray(th)

        # per-env rest joint positions in SMPL order, for the network-side
        # context IK (`im_network_builder.py:44 smpl_rest_joints`): global
        # rest pose accumulated over the (identity-rotation) tree
        off = np.asarray(self.model.joint_pos)        # (N, 24, 3) mujoco order
        rest = np.zeros_like(off)
        for j in range(1, 24):
            rest[:, j] = rest[:, self.model.parents[j]] + off[:, j]
        self.rest_joints_smpl = jnp.asarray(rest[:, S.MUJOCO_2_SMPL])

        # domain randomization engine (`base_task.py:250-445`)
        self.randomizer = domain_rand.DomainRandomizer(cfg.rand_specs) \
            if cfg.rand_specs else None

        self.obs_dim = 24 * 3 + 24 * 4 + 69 + 69 + 24 * 3 + 24 * 3 + bodies.shape[-1]
        self.num_actions = cfg.num_actions

    # -- array plumbing for SPMD ----------------------------------------------
    # Per-env arrays must enter jitted programs as ARGUMENTS (not closure
    # constants): XLA ignores the shardings of baked-in constants, so a
    # closure-captured model would silently replicate all compute. `arrays()`
    # extracts the pytree; `with_arrays()` rebinds traced values at trace time.

    ARRAY_FIELDS = ("model", "motion_ids", "motion_bodies",
                    "termination_heights", "lib", "rest_joints_smpl")

    def arrays(self) -> Dict[str, object]:
        return {f: getattr(self, f) for f in self.ARRAY_FIELDS}

    def with_arrays(self, arrs: Dict[str, object]) -> "HumanoidImEnv":
        import copy

        env = copy.copy(self)
        for f, v in arrs.items():
            setattr(env, f, v)
        return env

    # -- sharding -------------------------------------------------------------

    def shard(self, mesh, axis: str = "data") -> "HumanoidImEnv":
        """Copy of this env with per-env arrays laid out P(axis) over `mesh`
        and shared arrays (motion lib, termination heights) replicated.

        With these placements, any jit-compiled step/rollout/train program
        becomes SPMD data-parallel over the env axis — the TPU-native
        replacement for the reference's per-rank sim + Horovod allreduce
        (SURVEY.md §2.7): XLA partitions per-env compute and inserts
        all-reduces only for scalar/stat reductions.
        """
        import copy

        from vid2player3d_tpu import parallel

        env = copy.copy(self)
        env.motion_ids = parallel.shard_leading_axis(self.motion_ids, mesh, axis)
        env.motion_bodies = parallel.shard_leading_axis(self.motion_bodies,
                                                        mesh, axis)
        env.model = parallel.shard_leading_axis(self.model, mesh, axis)
        env.rest_joints_smpl = parallel.shard_leading_axis(
            self.rest_joints_smpl, mesh, axis)
        env.termination_heights = parallel.replicate(self.termination_heights,
                                                     mesh)
        env.lib = parallel.replicate(self.lib, mesh)
        return env

    # -- helpers --------------------------------------------------------------

    def _raw_obs(self, sim: ArticulationState) -> jnp.ndarray:
        """Raw state-dict concat (`humanoid_smpl_im.py:653-668`): the policy
        network computes the 734-dim imitation obs from this + context."""
        bp, bq, bl, ba = engine.fk_world(self.model, sim)
        dp = engine.dof_pos(sim)
        dv = engine.dof_vel(sim)
        N = bp.shape[0]
        return jnp.concatenate([
            bp.reshape(N, -1), bq.reshape(N, -1), dp, dv,
            bl.reshape(N, -1), ba.reshape(N, -1), self.motion_bodies,
        ], axis=-1)

    def split_obs(self, obs: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        N = obs.shape[0]
        dims = [24 * 3, 24 * 4, 69, 69, 24 * 3, 24 * 3, self.motion_bodies.shape[-1]]
        names = ["body_pos", "body_rot", "dof_pos", "dof_vel", "body_vel",
                 "body_ang_vel", "motion_bodies"]
        shapes = [(24, 3), (24, 4), (69,), (69,), (24, 3), (24, 3),
                  (self.motion_bodies.shape[-1],)]
        out = {}
        o = 0
        for n, d, sh in zip(names, dims, shapes):
            out[n] = obs[:, o:o + d].reshape((N,) + sh)
            o += d
        return out

    def _target(self, motion_times):
        """Reference state at `motion_times + dt` ('next frame' target,
        `humanoid_smpl_im.py:594-624`)."""
        return ML.get_motion_state(
            self.lib, self.motion_ids, motion_times + self.cfg.control_dt,
            adjust_height=True, ground_tolerance=self.cfg.ground_tolerance)

    # -- reset ----------------------------------------------------------------

    def reset_all(self, key) -> Tuple[EnvState, jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Reference-state init for every env (`humanoid_smpl_im.py:489-528`).
        Returns (state, raw_obs, context) where context carries
        `feat` (N, L+2P, 378) and `mask` (N, L+2P)."""
        cfg = self.cfg
        N = cfg.num_envs
        k_time, k_hybrid = jax.random.split(key)

        if cfg.state_init == "Start":
            motion_times = jnp.zeros(N)
        else:
            trunc = cfg.context_length * cfg.control_dt if cfg.truncate_time else None
            motion_times = ML.sample_time(self.lib, k_time, self.motion_ids,
                                          truncate_time=trunc)

        ref = ML.get_motion_state(self.lib, self.motion_ids, motion_times,
                                  adjust_height=True,
                                  ground_tolerance=cfg.ground_tolerance)
        sim = engine.set_state_from_reference(
            self.model, ref["root_pos"], ref["root_rot"], ref["root_vel"],
            ref["root_ang_vel"], ref["dof_pos"], ref["dof_vel"])

        state = EnvState(
            sim=sim,
            progress=jnp.zeros(N, jnp.int32),
            reset_buf=jnp.zeros(N, jnp.int32),
            terminate_buf=jnp.zeros(N, jnp.int32),
            motion_times=motion_times,
        )
        obs = self._raw_obs(sim)
        context = self.init_context(motion_times, key=k_hybrid)
        return state, obs, context

    def init_context(self, motion_times, key=None) -> Dict[str, jnp.ndarray]:
        """Motion-context window (`humanoid_smpl_im.py:530-563`): frames at
        motion_times + dt + dt·[-pad, L+pad), features
        [body_pos, body_rot, dof_pos, body_pos_gt, dof_pos_gt]."""
        cfg = self.cfg
        N = cfg.num_envs
        L = cfg.context_length + 2 * cfg.context_padding
        t0 = motion_times + cfg.control_dt
        steps = cfg.control_dt * jnp.arange(-cfg.context_padding,
                                            cfg.context_length + cfg.context_padding)
        all_times = t0[:, None] + steps[None]                      # (N, L)
        ids = jnp.broadcast_to(self.motion_ids[:, None], (N, L))

        st = ML.get_motion_state(self.lib, ids.reshape(-1), all_times.reshape(-1),
                                 adjust_height=True,
                                 ground_tolerance=cfg.ground_tolerance)
        rb_pos = st["rb_pos"].reshape(N, L, -1)
        rb_rot = st["rb_rot"].reshape(N, L, -1)
        dof = st["dof_pos"].reshape(N, L, -1)

        # observed channel may be corrupted (`_transform_target`); the last
        # two feature blocks stay ground-truth for the aux supervised losses
        # (`humanoid_smpl_im.py:694-722`)
        obs_pos = rb_pos
        conf = jnp.ones((N, L, 24), rb_pos.dtype)
        if cfg.transform_specs is not None and cfg.transform_specs.active:
            ck = key if key is not None else jax.random.PRNGKey(0)
            # rb_pos is mujoco-ordered — named joint masks must resolve
            # against the mujoco name list
            obs_pos, conf = corrupt.corrupt_body_pos(
                ck, rb_pos.reshape(N, L, 24, 3), cfg.transform_specs,
                body_names=tuple(S.MUJOCO_JOINT_NAMES))
            obs_pos = obs_pos.reshape(N, L, -1)

        feat = jnp.concatenate([obs_pos, rb_rot, dof, rb_pos, dof], axis=-1)

        lens = self.lib.motion_lengths[self.motion_ids]
        mask = all_times <= (lens + 2 * cfg.control_dt)[:, None]
        return {"feat": feat, "mask": mask, "conf": conf}

    # -- step -----------------------------------------------------------------

    def step(self, state: EnvState, action: jnp.ndarray
             ) -> Tuple[EnvState, StepOutput]:
        cfg = self.cfg
        N = cfg.num_envs
        sim = state.sim

        # zero actions of finished envs (`humanoid_smpl_im.py:126`)
        action = jnp.where(state.reset_buf[:, None] == 1, 0.0, action)

        # PD targets: absolute joint targets clamped around current pose (`:391-396`)
        cur_dof = engine.dof_pos(sim)
        dof_action = action[:, :69]
        pd_tar = jnp.clip(dof_action, cur_dof - cfg.pd_tar_lim, cur_dof + cfg.pd_tar_lim)

        # residual root force/torque in heading frame (`:141-154`)
        root_force = root_torque = None
        if cfg.residual_force_scale > 0:
            res_f = action[:, 69:72] * cfg.residual_force_scale
            res_t = action[:, 72:75] * cfg.res_torque_scale
            root_rot = Q.remove_base_rot(sim.root_quat)
            heading_q = Q.calc_heading_quat(root_rot)
            root_force = Q.quat_rotate(heading_q, res_f)
            root_torque = Q.quat_rotate(heading_q, res_t)

        # reward target = target BEFORE advancing time (`_save_prev_target_motion_state`)
        tar_rew = self._target(state.motion_times)

        sim = engine.control_step(
            self.model, sim, pd_tar, root_force, root_torque,
            substeps=cfg.substeps, control_dt=cfg.control_dt,
            contact_params=self.contact_params)

        progress = state.progress + 1
        motion_times = state.motion_times + cfg.control_dt

        # observations & reward
        bp, bq, bl, ba = engine.fk_world(self.model, sim)
        dp = engine.dof_pos(sim)
        dv = engine.dof_vel(sim)
        obs = jnp.concatenate([
            bp.reshape(N, -1), bq.reshape(N, -1), dp, dv,
            bl.reshape(N, -1), ba.reshape(N, -1), self.motion_bodies,
        ], axis=-1)

        reward, sub_rewards = self._reward(bp, bq, dp, dv, tar_rew)
        # zero reward for already-done envs (`humanoid_smpl_im.py:688-691`)
        was_done = state.reset_buf == 1
        reward = jnp.where(was_done, 0.0, reward)
        sub_rewards = jnp.where(was_done[:, None], 0.0, sub_rewards)

        # Divergence latch (`physics_mvae_controller.py:321-328,412-414`): a
        # diverged simulation terminates the env and its obs are sanitized so
        # that alive-masked losses stay finite (NaN·0 = NaN otherwise). The
        # latch triggers on MAGNITUDE as well as NaN/inf: a blown-up sim can
        # sit at 1e30 — finite, but its square overflows f32 inside the
        # critic/bounds losses and the running-stat updates, poisoning the
        # whole batch. No legitimate state exceeds ~1e3. The body-rot block
        # must sanitize to IDENTITY quaternions, not zeros — normalizing a
        # zero quat downstream would re-create the NaN.
        bad = ~jnp.all(jnp.isfinite(obs) & (jnp.abs(obs) < 1e6), axis=-1)
        safe = jnp.zeros((obs.shape[-1],), obs.dtype)
        safe = safe.at[72:168].set(
            jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0], obs.dtype), 24))
        obs = jnp.where(bad[:, None], safe[None], obs)
        reward = jnp.where(bad, 0.0, reward)
        sub_rewards = jnp.where(bad[:, None], 0.0, sub_rewards)

        # termination (`:724-739, 956-987`)
        reset, terminate = self._reset_logic(bp, progress, motion_times)
        reset = jnp.where(bad, 1, reset)
        terminate = jnp.where(bad, 1, terminate)
        reset = jnp.where(was_done, 1, reset)
        terminate = jnp.where(was_done, state.terminate_buf, terminate)

        new_state = EnvState(sim, progress, reset, terminate, motion_times)
        return new_state, StepOutput(obs=obs, reward=reward, done=reset,
                                     terminate=terminate, sub_rewards=sub_rewards)

    def _reward(self, body_pos, body_rot, dof_pos_, dof_vel_, tar):
        """Imitation reward (`humanoid_smpl_im.py:918-953`)."""
        rs = dict(self.cfg.reward_specs)

        dof_obs = dof_to_obs(dof_pos_)
        tar_dof_obs = dof_to_obs(tar["dof_pos"])
        dof_reward = jnp.exp(-rs["k_dof"] * jnp.mean(
            (dof_obs - tar_dof_obs) ** 2, axis=-1))

        vel_reward = jnp.exp(-rs["k_vel"] * jnp.mean(
            (tar["dof_vel"] - dof_vel_) ** 2, axis=-1))

        diff_pos = (tar["rb_pos"] - body_pos)
        body_pos_reward = jnp.exp(-rs["k_pos"] * jnp.mean(
            jnp.mean(diff_pos ** 2, axis=-1), axis=-1))

        diff_rot = Q.quat_mul(tar["rb_rot"], Q.quat_conjugate(body_rot))
        diff_angle = Q.quat_to_angle_axis(diff_rot)[0]
        body_rot_reward = jnp.exp(-rs["k_rot"] * jnp.mean(diff_angle ** 2, axis=-1))

        reward = (rs["w_dof"] * dof_reward + rs["w_vel"] * vel_reward
                  + rs["w_pos"] * body_pos_reward + rs["w_rot"] * body_rot_reward)
        subs = jnp.stack([dof_reward, vel_reward, body_pos_reward, body_rot_reward], -1)
        return reward, subs

    def _reset_logic(self, body_pos, progress, motion_times):
        cfg = self.cfg
        terminated = jnp.zeros(body_pos.shape[0], jnp.int32)
        if cfg.enable_early_termination:
            body_h = body_pos[..., 2]
            fall = body_h < self.termination_heights[None]
            fall = fall.at[:, self.contact_body_ids].set(False)
            fall = jnp.any(fall, axis=-1) & (progress > 1)
            terminated = jnp.where(fall, 1, terminated)
        lens = self.lib.motion_lengths[self.motion_ids]
        reach_max = progress >= cfg.max_episode_length - 1
        reach_end = motion_times >= lens
        reset = jnp.where(reach_max | reach_end, 1, terminated)
        return reset, terminated

    # -- network-side obs (shared with the learner) ---------------------------

    def imitation_obs(self, raw_obs, ctx_body_pos, ctx_body_rot, ctx_dof_pos):
        """734-dim obs from raw env obs + current context frame."""
        d = self.split_obs(raw_obs)
        return compute_imitation_obs(
            d["body_pos"], d["body_rot"], ctx_body_pos, ctx_body_rot,
            d["dof_pos"], d["dof_vel"], ctx_dof_pos, d["body_vel"],
            d["body_ang_vel"], d["motion_bodies"])
