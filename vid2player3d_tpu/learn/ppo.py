"""PPO actor-learner for the imitation env, fully fused under jit.

Replaces rl_games `A2CAgent`/`CommonAgent`/`ImitatorAgent`
(`embodied_pose/learning/common_agent.py`, `agents/im_agent.py`): one jitted
`train_epoch` = reset → 32-step rollout (lax.scan over the fused env step +
policy) → GAE → 6 mini-epochs × minibatch gradient steps (lax.scan with
shuffled gathers). No host↔device traffic inside an epoch.

Reference semantics preserved (file:line cited inline):
- per-step next-value bootstrap `next_vals·(1−terminated)` (`im_agent.py:348-359`)
- alive mask = envs not yet done, applied to all losses (`im_agent.py:527-535`)
- advantage normalized over alive samples (`im_agent.py:461-473`)
- GAE with per-step next_values (`common_agent.py:423-435`)
- fixed log-sigma −1.756, residual action mu += target dof
  (`amass_im.yaml`, `im_network_builder.py:226-229`)
- running obs norm 'ours' + value normalization (`running_norm.py`,
  `common_agent.py` normalize_value)
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import quat as Q
from ..envs.humanoid_im import HumanoidImEnv
from . import running_norm as RN
from .networks import ImitatorNet


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    horizon: int = 32
    mini_epochs: int = 6
    minibatch_size: int = 512
    learning_rate: float = 2e-5
    gamma: float = 0.99
    tau: float = 0.95
    e_clip: float = 0.2
    critic_coef: float = 5.0
    entropy_coef: float = 0.0
    bounds_loss_coef: float = 0.0
    grad_norm: float = 50.0
    sigma_init: float = -1.756
    normalize_value: bool = True
    normalize_advantage: bool = True
    obs_clip: float = 5.0
    # rl_games AdaptiveScheduler: per-minibatch lr *= / 1.5 keyed on the
    # minibatch KL vs threshold ('constant' matches every shipped reference
    # cfg). 'linear' decays lr linearly over `lr_decay_epochs` to
    # `lr_min_frac`·lr — the long-run recipe: round-3's 500-epoch constant-lr
    # amass_im ended with per-epoch KL 0.138 / clip_frac 0.66 (updates
    # saturating the clip); linear decay keeps late-training PPO ratios in
    # range without the adaptive controller's min-lr stall on small configs
    lr_schedule: str = "constant"          # constant | adaptive | linear
    kl_threshold: float = 0.008
    min_lr: float = 1e-6
    max_lr: float = 1e-2
    lr_decay_epochs: int = 2000
    lr_min_frac: float = 0.05
    # multi-chip minibatch semantics. False: `minibatch_size` is GLOBAL —
    # exact single-chip parity, but at the reference's minibatch 512 a
    # dp-way mesh all-reduces gradients every 512/dp-sample step and epoch
    # efficiency collapses (measured 0.32 at 4 chips). True: `minibatch_size`
    # is PER CHIP — each shard consumes its own local minibatches, exactly
    # the reference's Horovod data parallelism (each rank owns its envs and
    # steps on LOCAL minibatches of 512 while gradients all-reduce,
    # `common_agent.py:388-395`, `amp_datasets` local shuffling): dp× fewer,
    # dp× larger optimizer steps, so the update phase scales ~linearly.
    minibatch_per_chip: bool = False
    # gradient synchronization cadence under DP:
    #  - "per_minibatch": Horovod-exact — gradients all-reduce every
    #    optimizer step (`common_agent.py:388-395`); at the shipped
    #    amass_im minibatch 512 this is ~1536 × 18.6 MB all-reduces per
    #    epoch → ICI-roofline epoch efficiency ~0.32 at 4 chips.
    #  - "per_mini_epoch": local SGD — each shard's params/optimizer evolve
    #    on its own local minibatches for one full mini-epoch, then params
    #    AND Adam moments average across the mesh (6 all-reduces per epoch
    #    instead of 1536) → roofline efficiency ≥0.99 at 4-16 chips with
    #    the SHIPPED hyperparameters. Shard drift over one mini-epoch at
    #    lr 2e-5 is far inside PPO's trust region (KL per mini-epoch ~1e-2).
    dp_sync: str = "per_minibatch"         # per_minibatch | per_mini_epoch
    # network-side context pipeline (`im_network_builder.py:78-138`): IK the
    # (possibly corrupted) context joint positions with learned twist/leaf
    # residuals, consume the confidence channel, and supervise the IK
    # reconstruction with aux dof-rot6d / body-pos losses
    # (`humanoid_smpl_im.py:694-722`, `im_agent.py:527-535`)
    use_context_ik: bool = False
    aux_w_dof: float = 1.0
    aux_w_pos: float = 10.0
    # MLP-trunk compute dtype: "auto" = bfloat16 on TPU (MXU-native, halves
    # weight/activation traffic in the update scan; params, mu/value heads
    # and the optimizer stay f32), f32 elsewhere. The update phase dominates
    # the epoch ~8:1 at reference minibatch 512, so this is the main
    # total_fps lever (VERDICT r02 #2).
    compute_dtype: str = "auto"            # auto | f32 | bf16
    # single Pallas kernel per leaf for clip+Adam+apply (ops/fused_adam.py):
    # one read-modify-write VMEM pass over params+moments+grads per
    # minibatch step instead of the optax chain's separate stages. Measured
    # on the real v5e chip (amass_im scale, 4096 envs, minibatch 512): the
    # per-leaf kernel is SLOWER than the XLA-fused optax chain — 0.611
    # s/epoch vs 0.464 (214k vs 282k total_fps) — the ~16 kernel launches
    # per minibatch step cost more than the HBM traffic they save, and XLA
    # already fuses the optax stages into few passes. "auto" therefore
    # resolves to OFF everywhere; "on" keeps the kernel reachable
    # (semantics are bit-identical, tests/test_ops.py parity tests).
    fused_optimizer: str = "auto"          # auto(=off) | on | off


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class TrainState:
    params: Any
    opt_state: Any
    obs_norm: RN.RunningNormState
    val_norm: RN.RunningNormState
    key: jnp.ndarray
    epoch: jnp.ndarray
    lr: jnp.ndarray

    def tree_flatten(self):
        return (self.params, self.opt_state, self.obs_norm, self.val_norm,
                self.key, self.epoch, self.lr), ()

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch)


def resolve_compute_dtype(name: str):
    """"auto" -> bfloat16 on TPU, float32 on CPU/GPU (CPU bf16 is emulated
    and slow; tests run the CPU mesh in f32)."""
    if name == "auto":
        from ..utils.runtime import on_cpu

        return jnp.float32 if on_cpu() else jnp.bfloat16
    return {"f32": jnp.float32, "bf16": jnp.bfloat16}[name]


def _make_adam(compute_dtype: str) -> optax.GradientTransformation:
    """f32 Adam on CPU; bf16-moment Adam on accelerators (learn/optim.py)."""
    if resolve_compute_dtype(compute_dtype) == jnp.bfloat16:
        from .optim import scale_by_adam_lowmem

        return scale_by_adam_lowmem(eps=1e-8)
    return optax.scale_by_adam(eps=1e-8)


def diag_gaussian_neglogp(actions, mu, sigma):
    d = actions.shape[-1]
    return (0.5 * jnp.sum(((actions - mu) / sigma) ** 2, axis=-1)
            + 0.5 * np.log(2 * np.pi) * d + jnp.sum(jnp.log(sigma), axis=-1))


def policy_kl(mu0, sigma0, mu1, sigma1):
    """Analytic KL(N0 || N1) per sample (rl_games `torch_ext.policy_kl`)."""
    c1 = jnp.log(sigma1 / sigma0 + 1e-8)
    c2 = (sigma0 ** 2 + (mu1 - mu0) ** 2) / (2.0 * sigma1 ** 2 + 1e-8)
    return jnp.sum(c1 + c2 - 0.5, axis=-1)


class ImitationPPO:
    """Owns the env + network statics; all train state flows through pure fns.

    Multi-chip: pass `mesh` (1-D, axis 'data'). Env-axis arrays (sim state,
    rollout buffers, per-env model) shard along 'data'; params/optimizer state
    replicate; XLA's SPMD partitioner inserts the gradient/stat all-reduces —
    the TPU-native analogue of the reference's Horovod DP (SURVEY.md §2.7).
    Minibatch shuffling is per-shard (each device permutes its own samples, as
    each Horovod rank shuffles its local batch), so no cross-chip gathers.
    """

    def __init__(self, env: HumanoidImEnv, cfg: PPOConfig = PPOConfig(),
                 seed: int = 7, mesh=None):
        self.env = env
        self.cfg = cfg
        self.mesh = mesh
        self.dp = int(np.prod(mesh.devices.shape)) if mesh is not None else 1
        assert env.cfg.num_envs % self.dp == 0
        # global minibatches split across chips; per-chip minibatches are
        # local by definition
        assert cfg.minibatch_per_chip or cfg.minibatch_size % self.dp == 0
        self.num_actions = env.num_actions
        self.obs_dim = 734

        self.net = ImitatorNet(num_actions=self.num_actions,
                               dtype=resolve_compute_dtype(cfg.compute_dtype))
        key = jax.random.PRNGKey(seed)
        params = self.net.init(key, jnp.zeros((1, self.obs_dim)))
        if cfg.use_context_ik:
            from .networks import ContextHeads

            self.ctx_net = ContextHeads()
            ctx_params = self.ctx_net.init(
                jax.random.fold_in(key, 1), jnp.zeros((1, 24 * 3 + 24)))
            params = {"ac": params, "ctx": ctx_params}
        # lr applied manually in the minibatch step so the adaptive schedule
        # can ride through lax.scan as a carried scalar; on TPU both Adam
        # moments store in bf16 — the update scan is HBM-bound on
        # optimizer-state traffic at reference minibatch 512
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.grad_norm),
            _make_adam(cfg.compute_dtype),
        )
        # auto resolves to OFF: measured slower than the XLA-fused optax
        # chain on the real chip (see PPOConfig.fused_optimizer comment)
        self._use_fused = cfg.fused_optimizer == "on"
        self._init = TrainState(
            params=params,
            opt_state=self.tx.init(params),
            obs_norm=RN.RunningNormState.create(self.obs_dim),
            val_norm=RN.RunningNormState.create(1),
            key=key,
            epoch=jnp.zeros((), jnp.int32),
            lr=jnp.asarray(cfg.learning_rate, jnp.float32),
        )
        self.sigma = jnp.full((self.num_actions,), np.exp(cfg.sigma_init),
                              dtype=jnp.float32)

        nbatch = env.cfg.num_envs * cfg.horizon
        if cfg.minibatch_per_chip:
            local = nbatch // self.dp
            assert local % cfg.minibatch_size == 0, \
                f"local batch {local} not divisible by {cfg.minibatch_size}"
            self.num_minibatches = local // cfg.minibatch_size
        else:
            assert nbatch % cfg.minibatch_size == 0, \
                f"batch {nbatch} not divisible by minibatch {cfg.minibatch_size}"
            self.num_minibatches = nbatch // cfg.minibatch_size

    def save_checkpoint(self, path: str, ts: TrainState) -> None:
        """Persist policy + running normalizers + optimizer state + schedule
        scalars — full resume like rl_games' .pth (model, running stats AND
        optimizer, `common_agent.py` get_full_state_weights;
        `im_agent.py:255-266`)."""
        from ..utils import checkpoint as CK

        CK.save_pytree(path, {"params": ts.params, "obs_norm": ts.obs_norm,
                              "val_norm": ts.val_norm,
                              "opt_state": ts.opt_state,
                              "epoch": ts.epoch, "lr": ts.lr})

    def load_checkpoint(self, path: str) -> TrainState:
        """Full resume: params + running stats + optimizer state + epoch/lr
        (stats migration per `im_agent.py:141-155`). Checkpoints written
        before optimizer state was saved load fine — missing keys keep the
        fresh Adam init (surgery semantics).

        PURE: returns the restored TrainState without mutating the agent —
        loads never affect subsequent `init_state()` calls."""
        from ..utils import checkpoint as CK

        like = {"params": self._init.params, "obs_norm": self._init.obs_norm,
                "val_norm": self._init.val_norm,
                "opt_state": self._init.opt_state,
                "epoch": self._init.epoch, "lr": self._init.lr}
        loaded = CK.load_pytree_with_surgery(path, like)
        # lr is controller state only under the adaptive schedule; constant-lr
        # warm starts keep the NEW config's rate (stage-2 fine-tunes drop the
        # lr, `djokovic_im.yaml` lr 1e-5 from amass_im 2e-5)
        lr = loaded["lr"] if self.cfg.lr_schedule == "adaptive" \
            else self._init.lr
        ts = dataclasses.replace(
            self._init, params=loaded["params"], obs_norm=loaded["obs_norm"],
            val_norm=loaded["val_norm"], opt_state=loaded["opt_state"],
            epoch=loaded["epoch"], lr=lr)
        return self._finalize(ts)

    def _finalize(self, ts: TrainState) -> TrainState:
        # fresh buffers every call: train_epoch donates its input state, so the
        # cached template must never be handed out by reference
        ts = jax.tree_util.tree_map(jnp.copy, ts)
        if self.mesh is not None:
            from vid2player3d_tpu import parallel

            ts = parallel.replicate(ts, self.mesh)
        return ts

    def init_state(self) -> TrainState:
        return self._finalize(self._init)

    # -- policy forward -------------------------------------------------------

    def _ac(self, params):
        """Actor-critic subtree of the params pytree (context-IK mode nests
        {'ac', 'ctx'})."""
        return params["ac"] if self.cfg.use_context_ik else params

    def _ctx_frame(self, ctx_feat, t):
        """Context frame at rollout step t (index pad + t). Feature layout
        (`humanoid_im.init_context`): [obs_pos 72 | rot 96 | dof 69 |
        pos_gt 72 | dof_gt 69]."""
        idx = self.env.cfg.context_padding + t
        f = jax.lax.dynamic_index_in_dim(ctx_feat, idx, axis=1, keepdims=False)
        N = f.shape[0]
        return (f[:, :72].reshape(N, 24, 3), f[:, 72:168].reshape(N, 24, 4),
                f[:, 168:237], f[:, 237:309].reshape(N, 24, 3),
                f[:, 309:378])

    def _context_targets(self, params, ctx_pos_mj, conf_mj, rest_smpl):
        """Context-IK stage (`im_network_builder.py:78-115 perform_ik`): the
        (possibly corrupted) context joint positions + confidence channel →
        learned twist/leaf residuals → analytic IK → imitation targets.

        ctx_pos_mj (B,24,3) mujoco-order positions; conf_mj (B,24);
        rest_smpl (B,24,3) SMPL-order rest pose. Returns
        (tgt_dof (B,69), tgt_pos (B,24,3), tgt_rot quat (B,24,4),
        local_mj (B,24,3,3))."""
        from ..core import ik as IK
        from ..core import rot as Rt
        from ..core import smpl as S

        B = ctx_pos_mj.shape[0]
        pos_smpl = ctx_pos_mj[:, S.MUJOCO_2_SMPL]
        conf_smpl = conf_mj[:, S.MUJOCO_2_SMPL]
        xin = jnp.concatenate(
            [(pos_smpl - pos_smpl[:, :1]).reshape(B, 72), conf_smpl], axis=-1)
        phis, leaf6d = self.ctx_net.apply(params["ctx"], xin)
        local, chain, joints = IK.perform_context_ik(pos_smpl, rest_smpl,
                                                     phis, leaf6d)
        local_mj = local[:, S.SMPL_2_MUJOCO]
        chain_mj = chain[:, S.SMPL_2_MUJOCO]
        joints_mj = joints[:, S.SMPL_2_MUJOCO]
        tgt_dof = Rt.rotmat_to_angle_axis(
            local_mj[:, 1:].reshape(-1, 3, 3)).reshape(B, 69)
        tgt_rot = Q.rotmat_to_quat(chain_mj)
        return tgt_dof, joints_mj, tgt_rot, local_mj

    def _forward(self, env, params, obs_norm, raw_obs, ctx_feat, t,
                 ctx_conf=None):
        """raw env obs + context → (imitation_obs, normalized_obs, mu, value_norm,
        target_dof). mu includes the residual action. In context-IK mode the
        targets come from the IK of the (corrupted) context positions, not
        the ground-truth channels."""
        cb_pos, cb_rot, c_dof, _, _ = self._ctx_frame(ctx_feat, t)
        if self.cfg.use_context_ik:
            if ctx_conf is None:
                conf = jnp.ones(cb_pos.shape[:-1], cb_pos.dtype)
            else:
                idx = self.env.cfg.context_padding + t
                conf = jax.lax.dynamic_index_in_dim(ctx_conf, idx, axis=1,
                                                    keepdims=False)
            tgt_dof, tgt_pos, tgt_rot, _ = self._context_targets(
                params, cb_pos, conf, env.rest_joints_smpl)
            io = env.imitation_obs(raw_obs, tgt_pos, tgt_rot, tgt_dof)
            c_dof = tgt_dof
        else:
            io = env.imitation_obs(raw_obs, cb_pos, cb_rot, c_dof)
        io_n = RN.normalize(obs_norm, io, self.cfg.obs_clip)
        mu, value = self.net.apply(self._ac(params), io_n)
        mu = mu.at[:, :69].add(c_dof)  # residual action (`im_network_builder.py:226-229`)
        return io, io_n, mu, value, c_dof

    # -- rollout --------------------------------------------------------------

    def _rollout(self, env, ts: TrainState, key):
        cfg = self.cfg
        k_reset, k_act = jax.random.split(key)
        env_state, raw_obs, ctx = env.reset_all(k_reset)
        ctx_feat = ctx["feat"]
        ctx_conf = ctx.get("conf") if cfg.use_context_ik else None

        dr = env.randomizer
        dr_step = ts.epoch * cfg.horizon

        def step_fn(carry, t):
            env_state, raw_obs, key = carry
            key, k, k_dr = jax.random.split(key, 3)
            io, io_n, mu, v_norm, c_dof = self._forward(
                env, ts.params, ts.obs_norm, raw_obs, ctx_feat, t, ctx_conf)
            value = RN.unnormalize_value(ts.val_norm, v_norm[:, None])[:, 0] \
                if cfg.normalize_value else v_norm
            alive = (env_state.reset_buf == 0).astype(jnp.float32)

            noise = jax.random.normal(k, mu.shape)
            action = mu + self.sigma[None] * noise
            neglogp = diag_gaussian_neglogp(action, mu, self.sigma[None])

            # domain-rand action noise applied to what the env executes
            # (`base_task.py:276-287`); the stored action stays the policy's
            env_action = dr.randomize_actions(k_dr, action, dr_step) \
                if dr is not None and dr.act_specs else action
            env_state2, out = env.step(env_state, env_action)
            obs_next = dr.randomize_obs(k_dr, out.obs, dr_step) \
                if dr is not None and dr.obs_specs else out.obs

            store = dict(obs=io, action=action, mu=mu, neglogp=neglogp,
                         value=value, reward=out.reward,
                         done=out.done.astype(jnp.float32),
                         terminate=out.terminate.astype(jnp.float32),
                         alive=alive,
                         sub_rewards=out.sub_rewards, ctx_dof=c_dof)
            if cfg.use_context_ik:
                # the train-time forward re-runs the context IK with grads
                # (the reference re-runs forward_context flattened over time,
                # `im_network_builder.py:162-170`), so the minibatches carry
                # the raw state + per-step context blocks instead of the
                # finished observation
                cb_pos, _, _, gt_pos, gt_dof = self._ctx_frame(ctx_feat, t)
                idx = env.cfg.context_padding + t
                conf = jax.lax.dynamic_index_in_dim(ctx_conf, idx, axis=1,
                                                    keepdims=False)
                store.update(raw_obs=raw_obs, ctx_pos=cb_pos, ctx_conf=conf,
                             gt_pos=gt_pos, gt_dof=gt_dof,
                             rest=env.rest_joints_smpl)
            return (env_state2, obs_next, key), store

        (env_state, last_obs, _), traj = jax.lax.scan(
            step_fn, (env_state, raw_obs, k_act), jnp.arange(cfg.horizon))

        # next-value bootstrap with terminate masking (`im_agent.py:348-359`):
        # v(obs_{t+1}) equals the value computed at loop top t+1, so carry it
        # instead of a second policy forward per step; one extra forward for
        # the final obs closes the horizon.
        _, _, _, vn_last, _ = self._forward(env, ts.params, ts.obs_norm,
                                            last_obs, ctx_feat, cfg.horizon,
                                            ctx_conf)
        v_last = RN.unnormalize_value(ts.val_norm, vn_last[:, None])[:, 0] \
            if cfg.normalize_value else vn_last
        v_next = jnp.concatenate([traj["value"][1:], v_last[None]], axis=0)
        traj["next_value"] = v_next * (1.0 - traj["terminate"])
        return traj

    def _gae(self, traj):
        """`common_agent.py:423-435`: delta = r + γ·next_v − v;
        A ← delta + γτ(1−done)·A."""
        cfg = self.cfg

        def scan_fn(lastgaelam, x):
            reward, value, next_value, done = x
            delta = reward + cfg.gamma * next_value - value
            lastgaelam = delta + cfg.gamma * cfg.tau * (1.0 - done) * lastgaelam
            return lastgaelam, lastgaelam

        _, advs = jax.lax.scan(
            scan_fn, jnp.zeros_like(traj["reward"][0]),
            (traj["reward"], traj["value"], traj["next_value"], traj["done"]),
            reverse=True)
        return advs

    # -- update ---------------------------------------------------------------

    def _loss(self, params, batch, obs_norm, sigma):
        cfg = self.cfg
        aux = {}
        if cfg.use_context_ik:
            # re-run the context IK with gradients flowing into the twist/
            # leaf heads; the observation itself depends on the IK targets.
            # Minibatch leaves carry leading (dp, mb) dims — flatten for the
            # shape-sensitive IK/obs path, restore for the masked losses.
            lead = batch["action"].shape[:-1]
            tgt_dof, tgt_pos, tgt_rot, local_mj = self._context_targets(
                params, batch["ctx_pos"].reshape(-1, 24, 3),
                batch["ctx_conf"].reshape(-1, 24),
                batch["rest"].reshape(-1, 24, 3))
            io = self.env.imitation_obs(
                batch["raw_obs"].reshape(-1, batch["raw_obs"].shape[-1]),
                tgt_pos, tgt_rot, tgt_dof)
            io = io.reshape(lead + io.shape[-1:])
            ctx_dof = tgt_dof.reshape(lead + (69,))
            # aux supervised context losses (`humanoid_smpl_im.py:694-722`):
            # IK dof rot6d vs GT dof rot6d; IK body pos vs GT body pos
            from ..core import rot as Rt

            B = tgt_dof.shape[0]
            gt_rotmat = Q.quat_to_rotmat(
                Q.exp_map_to_quat(batch["gt_dof"].reshape(B, 23, 3)))
            gt6 = Rt.rotmat_to_rot6d(gt_rotmat.reshape(-1, 3, 3)).reshape(
                B, -1)
            ik6 = Rt.rotmat_to_rot6d(
                local_mj[:, 1:].reshape(-1, 3, 3)).reshape(B, -1)
            aux["aux_dof_loss"] = ((ik6 - gt6) ** 2).mean(-1).reshape(lead)
            aux["aux_pos_loss"] = ((tgt_pos - batch["gt_pos"].reshape(
                -1, 24, 3)) ** 2).mean((-1, -2)).reshape(lead)
        else:
            io = batch["obs"]
            ctx_dof = batch["ctx_dof"]
        io_n = RN.normalize(obs_norm, io, cfg.obs_clip)
        mu_raw, v_norm = self.net.apply(self._ac(params), io_n)
        mu = mu_raw.at[..., :69].add(ctx_dof)
        neglogp = diag_gaussian_neglogp(batch["action"], mu, sigma[None])

        ratio = jnp.exp(batch["old_neglogp"] - neglogp)
        surr1 = batch["adv"] * ratio
        surr2 = batch["adv"] * jnp.clip(ratio, 1.0 - cfg.e_clip, 1.0 + cfg.e_clip)
        a_loss = jnp.maximum(-surr1, -surr2)
        clipped = (jnp.abs(ratio - 1.0) > cfg.e_clip).astype(jnp.float32)

        c_loss = (v_norm - batch["return_norm"]) ** 2

        soft_bound = 1.0
        b_loss = (jnp.clip(mu - soft_bound, 0.0, None) ** 2
                  + jnp.clip(mu + soft_bound, None, 0.0) ** 2).sum(-1)

        mask = batch["alive"]
        denom = jnp.maximum(mask.sum(), 1.0)

        def masked(x):
            return (x * mask).sum() / denom

        loss = (masked(a_loss) + cfg.critic_coef * masked(c_loss)
                + cfg.bounds_loss_coef * masked(b_loss))
        kl = masked(policy_kl(mu, sigma[None], batch["old_mu"], sigma[None]))
        stats = dict(a_loss=masked(a_loss), c_loss=masked(c_loss),
                     b_loss=masked(b_loss), clip_frac=masked(clipped), kl=kl)
        if cfg.use_context_ik:
            # alive-masked aux losses added to the PPO objective
            # (`im_agent.py:527-535` env aux losses)
            aux_dof = masked(aux["aux_dof_loss"])
            aux_pos = masked(aux["aux_pos_loss"])
            loss = loss + cfg.aux_w_dof * aux_dof + cfg.aux_w_pos * aux_pos
            stats.update(aux_dof_loss=aux_dof, aux_pos_loss=aux_pos)
        return loss, stats

    # -- epoch ----------------------------------------------------------------

    def train_epoch(self, ts: TrainState) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """Env arrays enter as a real jit argument so their P('data')
        shardings anchor the SPMD partitioner (constants' shardings are
        ignored and would replicate all compute)."""
        return self._epoch(ts, self.env.arrays())

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _epoch(self, ts: TrainState, env_arrays) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        cfg = self.cfg
        env = self.env.with_arrays(env_arrays)
        key, k_roll, k_shuffle, k_dr = jax.random.split(ts.key, 4)

        # domain randomization: fresh per-env model perturbation each epoch
        # — every env re-initializes at epoch start, so this is the fused
        # analog of the reference's reset-path randomization with schedules
        # (`base_task.py:250-445`); schedule runs on policy steps
        if env.randomizer is not None and env.randomizer.model_specs:
            dr_step = ts.epoch * cfg.horizon
            env = env.with_arrays({
                **env_arrays,
                "model": env.randomizer.randomize_model(
                    k_dr, env_arrays["model"], step=dr_step)})

        traj = self._rollout(env, ts, k_roll)
        advs = self._gae(traj)
        returns = advs + traj["value"]

        T, N = cfg.horizon, env.cfg.num_envs
        B = T * N
        dp = self.dp
        local_B = B // dp

        def flat(x):
            """(T, N, ...) → (dp, local_B, ...), env-axis major so each block
            stays on its own shard (reshapes of a sharded-major axis are local)."""
            x = jnp.swapaxes(x, 0, 1)                      # (N, T, ...)
            return x.reshape((dp, local_B) + x.shape[2:])

        obs_f = flat(traj["obs"])
        alive_f = flat(traj["alive"])

        # context dof stored during rollout so the train-time forward can re-apply
        # the residual action without re-gathering the context window
        ctx_dof_f = flat(traj["ctx_dof"])

        # Update running obs stats once per epoch on the full batch. The update
        # takes effect NEXT epoch: training this epoch must normalize with the
        # same (frozen) stats the rollout used, or old_neglogp / new mu disagree
        # and the PPO ratio is garbage from the first minibatch.
        obs_norm_next = RN.update(ts.obs_norm, obs_f)
        obs_norm = ts.obs_norm

        # value/return normalization (`normalize_value`)
        val_norm = RN.update(ts.val_norm, returns.reshape(-1, 1)) \
            if cfg.normalize_value else ts.val_norm
        returns_f = flat(returns)
        if cfg.normalize_value:
            ret_norm_f = RN.normalize_value(val_norm, returns_f[..., None])[..., 0]
        else:
            ret_norm_f = returns_f

        adv_f = flat(advs)
        if cfg.normalize_advantage:
            denom = jnp.maximum(alive_f.sum(), 1.0)
            mean = (adv_f * alive_f).sum() / denom
            var = (((adv_f - mean) ** 2) * alive_f).sum() / denom
            adv_f = (adv_f - mean) / jnp.sqrt(var + 1e-8)

        batch_all = dict(
            obs=obs_f, action=flat(traj["action"]), old_mu=flat(traj["mu"]),
            old_neglogp=flat(traj["neglogp"]), adv=adv_f,
            return_norm=ret_norm_f, alive=alive_f, ctx_dof=ctx_dof_f)
        if cfg.use_context_ik:
            for k2 in ("raw_obs", "ctx_pos", "ctx_conf", "gt_pos", "gt_dof",
                       "rest"):
                batch_all[k2] = flat(traj[k2])
            del batch_all["obs"]  # train forward recomputes io from raw+ctx

        mb_local = cfg.minibatch_size if cfg.minibatch_per_chip \
            else cfg.minibatch_size // dp
        local_sgd = cfg.dp_sync == "per_mini_epoch" and dp > 1

        def _take_mb(perm, i):
            idx = jax.lax.dynamic_slice_in_dim(
                perm, i * mb_local, mb_local, axis=1)         # (dp, mb_local)

            def take(v):
                ix = idx.reshape(idx.shape + (1,) * (v.ndim - 2))
                return jnp.take_along_axis(v, ix, axis=1)

            return {k2: take(v) for k2, v in batch_all.items()}

        def _adapt_lr(lr, kl):
            if cfg.lr_schedule != "adaptive":
                return lr
            return jnp.where(kl > 2.0 * cfg.kl_threshold,
                             jnp.maximum(lr / 1.5, cfg.min_lr),
                             jnp.where(kl < 0.5 * cfg.kl_threshold,
                                       jnp.minimum(lr * 1.5, cfg.max_lr), lr))

        def mini_epoch(carry, k):
            params, opt_state, lr = carry
            # per-shard permutation: each data-parallel block shuffles its own
            # local_B samples, so the minibatch gather never crosses shards
            perm = jax.vmap(lambda kk: jax.random.permutation(kk, local_B))(
                jax.random.split(k, dp))                      # (dp, local_B)

            def mb_step(carry, i):
                params, opt_state, lr = carry
                mb = _take_mb(perm, i)
                (loss, stats), grads = jax.value_and_grad(
                    self._loss, has_aux=True)(params, mb, obs_norm, self.sigma)
                if self._use_fused:
                    # single Pallas read-modify-write pass over
                    # params+moments (ops/fused_adam.py); opt_state is the
                    # optax.chain tuple (clip EmptyState, ScaleByAdamState)
                    from ..ops.fused_adam import fused_clip_adam_apply
                    params, adam_state = fused_clip_adam_apply(
                        params, opt_state[1], grads, lr, cfg.grad_norm)
                    opt_state = (opt_state[0], adam_state)
                else:
                    updates, opt_state = self.tx.update(grads, opt_state,
                                                        params)
                    updates = jax.tree_util.tree_map(lambda u: -lr * u,
                                                     updates)
                    params = optax.apply_updates(params, updates)
                return (params, opt_state, _adapt_lr(lr, stats["kl"])), stats

            (params, opt_state, lr), stats = jax.lax.scan(
                mb_step, (params, opt_state, lr), jnp.arange(self.num_minibatches))
            return (params, opt_state, lr), stats

        def mini_epoch_local(carry, k):
            """Local-SGD mini-epoch: params/optimizer carry a leading dp axis
            sharded over 'data' — each shard steps on its own minibatches
            with no cross-shard traffic — then params AND moments average
            across the mesh once (a single all-reduce set per mini-epoch)."""
            params_dp, opt_dp, lr = carry
            perm = jax.vmap(lambda kk: jax.random.permutation(kk, local_B))(
                jax.random.split(k, dp))

            def mb_step(carry, i):
                params_dp, opt_dp, lr = carry
                mb = _take_mb(perm, i)

                def one(p, mb_row):
                    return jax.value_and_grad(self._loss, has_aux=True)(
                        p, mb_row, obs_norm, self.sigma)

                (loss, stats), grads = jax.vmap(one)(params_dp, mb)
                updates, opt_dp = jax.vmap(self.tx.update)(grads, opt_dp,
                                                           params_dp)
                updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
                params_dp = optax.apply_updates(params_dp, updates)
                stats = {k3: v.mean() for k3, v in stats.items()}
                return (params_dp, opt_dp, _adapt_lr(lr, stats["kl"])), stats

            (params_dp, opt_dp, lr), stats = jax.lax.scan(
                mb_step, (params_dp, opt_dp, lr),
                jnp.arange(self.num_minibatches))
            # synchronize: average shard replicas (params + Adam moments;
            # the int step count averages exactly — all shards took the
            # same number of steps)
            sync = jax.tree_util.tree_map(
                lambda p: jnp.broadcast_to(
                    jnp.mean(p.astype(jnp.float32), axis=0,
                             keepdims=True).astype(p.dtype), p.shape),
                (params_dp, opt_dp))
            return (sync[0], sync[1], lr), stats

        keys = jax.random.split(k_shuffle, cfg.mini_epochs)
        lr0 = ts.lr
        if cfg.lr_schedule == "linear":
            lr0 = cfg.learning_rate * jnp.clip(
                1.0 - ts.epoch.astype(jnp.float32) / cfg.lr_decay_epochs,
                cfg.lr_min_frac, 1.0)
        if local_sgd:
            from jax.sharding import NamedSharding, PartitionSpec

            def tile_dp(t):
                def put(p):
                    x = jnp.tile(p[None], (dp,) + (1,) * p.ndim)
                    if self.mesh is not None:
                        # anchor the replica axis onto the mesh so each shard
                        # materializes exactly one local copy
                        x = jax.lax.with_sharding_constraint(
                            x, NamedSharding(self.mesh,
                                             PartitionSpec("data",
                                                           *(None,) * p.ndim)))
                    return x

                return jax.tree_util.tree_map(put, t)

            (params_dp, opt_dp, lr), stats = jax.lax.scan(
                mini_epoch_local,
                (tile_dp(ts.params), tile_dp(ts.opt_state), lr0), keys)
            params = jax.tree_util.tree_map(lambda p: p[0], params_dp)
            opt_state = jax.tree_util.tree_map(lambda p: p[0], opt_dp)
        else:
            (params, opt_state, lr), stats = jax.lax.scan(
                mini_epoch, (ts.params, ts.opt_state, lr0), keys)

        metrics = {k2: v.mean() for k2, v in stats.items()}
        metrics["reward_mean"] = (traj["reward"] * traj["alive"]).sum() / \
            jnp.maximum(traj["alive"].sum(), 1.0)
        metrics["alive_ratio"] = traj["alive"].mean()
        metrics["episode_return"] = traj["reward"].sum(0).mean()
        subs = (traj["sub_rewards"] * traj["alive"][..., None]).sum((0, 1)) / \
            jnp.maximum(traj["alive"].sum(), 1.0)
        for i, name in enumerate(["dof_reward", "vel_reward", "body_pos_reward",
                                  "body_rot_reward"]):
            metrics[name] = subs[i]

        # success = episode ended by reaching the motion's end rather than a
        # tracking failure (the RLGPUAlgoObserver consecutive-success metric,
        # `embodied_pose/run.py:60-90`)
        done_ct = traj["done"].sum()
        succ = (traj["done"] * (1.0 - traj["terminate"])).sum()
        metrics["success_rate"] = succ / jnp.maximum(done_ct, 1.0)

        metrics["lr"] = lr
        new_ts = TrainState(params=params, opt_state=opt_state,
                            obs_norm=obs_norm_next, val_norm=val_norm, key=key,
                            epoch=ts.epoch + 1, lr=lr)
        return new_ts, metrics
