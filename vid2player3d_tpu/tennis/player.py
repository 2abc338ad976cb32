"""Kinematic MVAE player: the high-level policy's motion decoder.

TPU-native re-design of `vid2player/players/mvae_player.py:27-431`. The
reference wraps a torch MVAE plus mutable condition buffers; here the player
is a (spec, state) pair — `MVAEPlayerSpec` holds the frozen decoder params +
normalization stats + per-player behavior tables, `MVAEPlayerState` is a pure
pytree threaded through the jitted env step:

  state' = step(spec, state, latents, residual, key)

Per frame (reference `_update_mvae_state`, `mvae_player.py:204-419`):
  1. decode(z, condition) -> next normalized feature (+ phase sin/cos)
  2. roll the condition window; unnormalize; integrate root position by the
     predicted root velocity and re-write the (normalized) root position back
     into the condition
  3. phase -> [0, 2pi); swing-type classification: first time phase enters
     (2.0, 3.5) the wrist x decides forehand(1)/backhand(2); resets to -1
     past 3.5 (`:274-299`)
  4. hand-tuned per-player wrist/elbow residual base poses during swing
     phases + policy residual angles (`:301-419`), tables below.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rot as R
from .racket import R_ELBOW, R_WRIST, L_ELBOW, L_WRIST

# feature layout offsets for the federer-family MVAE recipe
# (root_pos 3 | root_velo 3 | joint_pos 23*3 | joint_velo 23*3 | rot6d 24*6)
ROOT_POS = slice(0, 3)
ROOT_VEL = slice(3, 6)
JOINT_POS = slice(6, 75)
JOINT_VEL = slice(75, 144)
JOINT_ROT6D = slice(144, 288)
FRAME_SIZE = 288

# (field, phase_lo, phase_hi, swing_type, value); fields index
# [elbow_twist, wrist_twist, wrist_shake, wrist_swing] base angles (x pi)
RESIDUAL_TABLES: Dict[str, Tuple[Tuple[int, float, float, int, float], ...]] = {
    # reference mvae_player.py:305-334
    "djokovic": (
        (0, 2.0, 3.2, 1, -0.75),   # fh swing: elbow twist
        (3, 2.0, 3.1, 1, -0.25),   # fh pre-contact: wrist swing
        (3, 3.1, 3.2, 1, 0.25),    # fh post-contact: wrist swing
        (0, 2.0, 3.2, 2, -0.25),   # bh swing: elbow twist
        (3, 2.0, 3.0, 2, 0.1),     # bh pre-contact: wrist swing
    ),
    # reference mvae_player.py:336-383
    "federer": (
        (0, 2.0, 3.2, 1, -0.5),
        (3, 2.0, 3.1, 1, -0.25),
        (3, 3.1, 3.2, 1, 0.25),
        (1, 2.0, 3.5, 2, -0.25),   # bh: wrist twist (grip change)
        (2, 2.0, 3.5, 2, 0.15),    # bh: wrist shake
        (1, 2.0, 3.5, 3, -0.1),    # bh slice: wrist twist
        (1, 2.0, 3.3, 0, -0.5),    # serve: wrist twist
        (2, 2.0, 3.3, 0, 0.1),     # serve: wrist shake
        (0, 2.0, 3.3, 0, -0.25),   # serve: elbow twist
        (3, 2.0, 3.0, 0, -0.5),    # pre-serve: wrist swing
    ),
    # reference mvae_player.py:385-410
    "nadal": (
        (0, 2.5, 3.2, 1, -0.75),
        (3, 2.5, 3.2, 1, 0.25),
        (1, 2.0, 3.5, 2, -0.4),
        (3, 2.0, 3.0, 2, -0.25),
    ),
}


@dataclasses.dataclass(frozen=True)
class MVAEPlayerSpec:
    """Frozen decoder + stats + behavior tables for one player."""
    decode: Callable    # (params, z (N,latent), cond (N,T*F)) -> (feat, phase)
    params: object      # frozen MVAE decoder params (pytree)
    avg: jnp.ndarray    # (F,) feature normalization stats
    std: jnp.ndarray
    player: str = "federer"
    righthand: bool = True
    latent_size: int = 32
    num_condition_frames: int = 1
    residual_scale: float = 0.1   # cfg residual_dof_scale
    is_train: bool = True

    @property
    def residual_joints(self):
        return (R_ELBOW, R_WRIST) if self.righthand else (L_ELBOW, L_WRIST)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class MVAEPlayerState:
    condition: jnp.ndarray      # (N, T, F) normalized features
    root_pos: jnp.ndarray       # (N, 3)
    root_vel: jnp.ndarray       # (N, 3)
    joint_rotmat: jnp.ndarray   # (N, 24, 3, 3)
    joint_pos_kin: jnp.ndarray  # (N, 23, 3) VAE-predicted joint positions
    phase_pred: jnp.ndarray     # (N,) radians in [0, 2pi)
    swing_type: jnp.ndarray     # (N,) int32: -1 unk, 0 serve, 1 fh, 2 bh, 3 slice
    swing_type_cycle: jnp.ndarray  # (N,) int32 last known swing this cycle

    def tree_flatten(self):
        return (self.condition, self.root_pos, self.root_vel,
                self.joint_rotmat, self.joint_pos_kin, self.phase_pred,
                self.swing_type, self.swing_type_cycle), ()

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch)


def _unpack(feature):
    """Raw (unnormalized) feature -> (root_pos, root_vel, joint_pos (N,23,3),
    rot6d (N,24,6))."""
    N = feature.shape[0]
    return (feature[:, ROOT_POS], feature[:, ROOT_VEL],
            feature[:, JOINT_POS].reshape(N, 23, 3),
            feature[:, JOINT_ROT6D].reshape(N, 24, 6))


def reset(spec: MVAEPlayerSpec, init_feature_raw: jnp.ndarray, root_xy=None
          ) -> MVAEPlayerState:
    """Init from a raw (unnormalized) dataset frame; optionally teleport the
    root to a sampled court position (reference `mvae_player.py:229-255`)."""
    N = init_feature_raw.shape[0]
    root_pos, root_vel, joint_pos, rot6d = _unpack(init_feature_raw)
    if root_xy is not None:
        root_pos = jnp.concatenate([root_xy, root_pos[:, 2:]], axis=-1)
        init_feature_raw = init_feature_raw.at[:, 0:2].set(root_xy)
    cond = ((init_feature_raw - spec.avg) / spec.std)[:, None]
    cond = jnp.tile(cond, (1, spec.num_condition_frames, 1))
    rotmat = R.rot6d_to_rotmat(rot6d)
    return MVAEPlayerState(
        condition=cond, root_pos=root_pos, root_vel=root_vel,
        joint_rotmat=rotmat, joint_pos_kin=joint_pos,
        phase_pred=jnp.zeros(N), swing_type=jnp.full(N, -1, jnp.int32),
        swing_type_cycle=jnp.full(N, -1, jnp.int32))


def step(spec: MVAEPlayerSpec, state: MVAEPlayerState, latents,
         residual: Optional[jnp.ndarray] = None) -> MVAEPlayerState:
    """One kinematic frame: decode + integrate + classify + residual pose."""
    N = latents.shape[0]
    cond_flat = state.condition.reshape(N, -1)
    feat_norm, phase_sc = spec.decode(spec.params, latents, cond_flat)

    condition = jnp.roll(state.condition, -1, axis=1)
    condition = condition.at[:, -1].set(feat_norm)
    feature = feat_norm * spec.std + spec.avg

    _, root_vel, joint_pos, rot6d = _unpack(feature)
    root_pos = state.root_pos + root_vel
    # write integrated root back into the condition, normalized (`:258-266`)
    root_norm = (root_pos - spec.avg[ROOT_POS]) / spec.std[ROOT_POS]
    condition = condition.at[:, -1, ROOT_POS].set(root_norm)

    # phase in [0, 2pi) (`:276-278`)
    phase = jnp.arctan2(phase_sc[:, 0], phase_sc[:, 1])
    phase = jnp.where(phase < 0, phase + 2 * jnp.pi, phase)

    # swing-type classification from wrist x at phase entry (`:279-299`)
    wrist_idx = (R_WRIST if spec.righthand else L_WRIST) - 1
    fh = jnp.where(joint_pos[:, wrist_idx, 0] > 0, 1, 2)
    fh = fh if spec.righthand else jnp.where(fh == 1, 2, 1)
    st = state.swing_type
    st = jnp.where((st == -1) & (phase > 2.0) & (phase < 3.5),
                   fh.astype(jnp.int32), st)
    st = jnp.where((st != -1) & (phase > 3.5), -1, st)
    st_cycle = jnp.where(st != -1, st, state.swing_type_cycle)

    rotmat = R.rot6d_to_rotmat(rot6d)
    if residual is not None and residual.shape[-1] > 0:
        rotmat = _apply_residual(spec, rotmat, phase, st,
                                 residual * spec.residual_scale)

    return MVAEPlayerState(
        condition=condition, root_pos=root_pos, root_vel=root_vel,
        joint_rotmat=rotmat, joint_pos_kin=joint_pos, phase_pred=phase,
        swing_type=st, swing_type_cycle=st_cycle)


def _apply_residual(spec: MVAEPlayerSpec, rotmat, phase, swing_type, res):
    """Per-player elbow/wrist base poses + policy residuals during swing
    phases (reference `mvae_player.py:301-419`). Fields: [elbow_twist,
    wrist_twist, wrist_shake, wrist_swing], each an axis-angle component."""
    N = rotmat.shape[0]
    res = jnp.clip(res, -0.25, 0.25)
    base = jnp.zeros((N, 4), rotmat.dtype)
    in_fh_or_bh = jnp.zeros(N, bool)
    for field, lo, hi, st, val in RESIDUAL_TABLES[spec.player]:
        m = (phase > lo) & (phase < hi) & (swing_type == st)
        base = base.at[:, field].set(jnp.where(m, val, base[:, field]))
        if st in (1, 2):
            in_fh_or_bh = in_fh_or_bh | m
    if not spec.is_train:
        res = jnp.where(in_fh_or_bh[:, None], res, 0.0)  # test-time gate

    elbow_j, wrist_j = spec.residual_joints
    elbow_aa = R.rotmat_to_angle_axis(rotmat[:, elbow_j])
    wrist_aa = R.rotmat_to_angle_axis(rotmat[:, wrist_j])
    pi = jnp.pi
    elbow_aa = elbow_aa.at[:, 0].set((base[:, 0] + res[:, 0]) * pi)
    wrist_aa = jnp.stack([
        base[:, 1] * pi,                      # wrist twist (no residual)
        (base[:, 2] + res[:, 1]) * pi,        # wrist shake
        (base[:, 3] + res[:, 2]) * pi,        # wrist swing
    ], axis=-1)
    rotmat = rotmat.at[:, elbow_j].set(R.angle_axis_to_rotmat(elbow_aa))
    rotmat = rotmat.at[:, wrist_j].set(R.angle_axis_to_rotmat(wrist_aa))
    return rotmat


def make_random_spec(key, player: str = "federer", latent_size: int = 32,
                     hidden: int = 64, experts: int = 3,
                     predict_phase: bool = True) -> MVAEPlayerSpec:
    """Untrained MVAE spec for tests/smoke runs (the reference cannot run at
    all without its withheld checkpoints; we can)."""
    from ..mvae.model import PoseMixtureVAE

    model = PoseMixtureVAE(
        frame_size_cond=FRAME_SIZE, frame_size_truth=FRAME_SIZE,
        frame_size_pred=FRAME_SIZE + (2 if predict_phase else 0),
        latent_size=latent_size, hidden_size=hidden, num_experts=experts)
    params = model.init(key, jnp.zeros((1, FRAME_SIZE)),
                        jnp.zeros((1, FRAME_SIZE)), key)["params"]

    def decode(p, z, cond):
        out = model.apply({"params": p}, z, cond,
                          method=PoseMixtureVAE.sample)
        if predict_phase:
            return out[:, :-2], out[:, -2:]
        return out, jnp.zeros((out.shape[0], 2), out.dtype)

    return MVAEPlayerSpec(
        decode=decode, params=params,
        avg=jnp.zeros(FRAME_SIZE), std=jnp.ones(FRAME_SIZE),
        player=player, latent_size=latent_size)


def spec_from_trainer(trainer, player: str = "federer",
                      **kw) -> MVAEPlayerSpec:
    """Build a player spec from a trained `MVAETrainer`."""
    def decode(p, z, cond):
        return trainer.decode(p, z, cond)

    return MVAEPlayerSpec(
        decode=decode, params=trainer.params,
        avg=jnp.asarray(trainer.dataset.avg),
        std=jnp.asarray(trainer.dataset.std),
        player=player, latent_size=trainer.opt.latent_size,
        num_condition_frames=trainer.opt.num_condition_frames, **kw)
