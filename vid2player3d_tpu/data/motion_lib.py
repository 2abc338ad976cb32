"""Device-resident motion database (TPU-native MotionLib).

Replaces `/root/reference/embodied_pose/utils/motion_lib.py`: all motion clips
concatenated into flat device arrays; sampling and bilinear frame-blend +
SLERP state lookup (`motion_lib.py:129-266`) are pure jnp functions that fuse
into the jitted env step (no per-reset host work — SURVEY.md §7 "hard parts").

Frame layout matches the reference: gts/grs/lrs concatenated over motions with
`length_starts` offsets; dof conversion = per-joint exp map of blended local
rotations (`motion_lib.py:460-488`, all joints spherical).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core import quat as Q
from ..core.skeleton import SkeletonMotion


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class MotionLib:
    """Concatenated motion tensors + per-motion metadata, all on device."""

    gts: jnp.ndarray            # (F, J, 3) global body translations
    grs: jnp.ndarray            # (F, J, 4) global body rotations
    lrs: jnp.ndarray            # (F, J, 4) local joint rotations
    grvs: jnp.ndarray           # (F, 3) global root linear velocity
    gravs: jnp.ndarray          # (F, 3) global root angular velocity
    dvs: jnp.ndarray            # (F, D) dof velocities
    length_starts: jnp.ndarray  # (M,) int32 frame offset per motion
    motion_lengths: jnp.ndarray  # (M,) seconds
    motion_num_frames: jnp.ndarray  # (M,) int32
    motion_dt: jnp.ndarray      # (M,)
    motion_weights: jnp.ndarray  # (M,) normalized sampling weights
    motion_bodies: jnp.ndarray  # (M, 11) gender + betas
    motion_body_scales: jnp.ndarray  # (M,)
    motion_min_verts_h: jnp.ndarray  # (M,)
    key_body_ids: jnp.ndarray   # (K,) int32
    # optional per-frame video metadata for video-conditioned fine-tuning
    # (reference `motion_lib.py:277-386` kp2d + camera loading); empty
    # (0-sized) when the source carries none
    kp2d: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.zeros((0, 24, 3), jnp.float32))
    cam_extrinsics: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.zeros((0, 4, 4), jnp.float32))  # (M,4,4)

    @property
    def has_kp2d(self) -> bool:
        return self.kp2d.shape[0] > 0

    def tree_flatten(self):
        fields = dataclasses.fields(self)
        return tuple(getattr(self, f.name) for f in fields), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def num_motions(self) -> int:
        return self.length_starts.shape[0]

    @property
    def num_bodies(self) -> int:
        return self.gts.shape[1]

    @property
    def num_dof(self) -> int:
        return self.dvs.shape[1]

    # -- host-side constructors ------------------------------------------------

    @classmethod
    def from_motions(cls, motions: Sequence[SkeletonMotion],
                     motion_bodies: Optional[np.ndarray] = None,
                     body_scales: Optional[np.ndarray] = None,
                     min_verts_h: Optional[np.ndarray] = None,
                     weights: Optional[np.ndarray] = None,
                     key_body_ids: Sequence[int] = (),
                     kp2d: Optional[np.ndarray] = None,
                     cam_extrinsics: Optional[np.ndarray] = None
                     ) -> "MotionLib":
        M = len(motions)
        gts = np.concatenate([m.global_translation for m in motions], 0)
        grs = np.concatenate([m.global_rotation for m in motions], 0)
        lrs = np.concatenate([m.local_rotation for m in motions], 0)
        grvs = np.concatenate([m.global_root_velocity for m in motions], 0)
        gravs = np.concatenate([m.global_root_angular_velocity for m in motions], 0)
        dvs = np.concatenate([_dof_vels(m) for m in motions], 0)

        nf = np.array([m.num_frames for m in motions], dtype=np.int32)
        starts = np.concatenate([[0], np.cumsum(nf)[:-1]]).astype(np.int32)
        dts = np.array([1.0 / m.fps for m in motions], dtype=np.float32)
        lengths = (nf - 1) * dts

        if weights is None:
            weights = np.ones(M, dtype=np.float32)
        weights = np.asarray(weights, dtype=np.float32)
        weights = weights / weights.sum()

        if motion_bodies is None:
            motion_bodies = np.zeros((M, 11), dtype=np.float32)
        if body_scales is None:
            body_scales = np.ones(M, dtype=np.float32)
        if min_verts_h is None:
            min_verts_h = np.zeros(M, dtype=np.float32)

        return cls(
            gts=jnp.asarray(gts), grs=jnp.asarray(grs), lrs=jnp.asarray(lrs),
            grvs=jnp.asarray(grvs), gravs=jnp.asarray(gravs), dvs=jnp.asarray(dvs),
            length_starts=jnp.asarray(starts),
            motion_lengths=jnp.asarray(lengths),
            motion_num_frames=jnp.asarray(nf),
            motion_dt=jnp.asarray(dts),
            motion_weights=jnp.asarray(weights),
            motion_bodies=jnp.asarray(np.asarray(motion_bodies, dtype=np.float32)),
            motion_body_scales=jnp.asarray(np.asarray(body_scales, dtype=np.float32)),
            motion_min_verts_h=jnp.asarray(np.asarray(min_verts_h, dtype=np.float32)),
            key_body_ids=jnp.asarray(np.asarray(key_body_ids, dtype=np.int32)),
            kp2d=jnp.asarray(np.asarray(kp2d, dtype=np.float32))
            if kp2d is not None else jnp.zeros((0, 24, 3), jnp.float32),
            cam_extrinsics=jnp.asarray(
                np.asarray(cam_extrinsics, dtype=np.float32))
            if cam_extrinsics is not None
            else jnp.zeros((0, 4, 4), jnp.float32),
        )

    def save(self, path: str):
        arrs = {f.name: np.asarray(getattr(self, f.name)) for f in dataclasses.fields(self)}
        np.savez_compressed(path, **arrs)

    @classmethod
    def load(cls, path: str) -> "MotionLib":
        with np.load(path) as z:
            return cls(**{k: jnp.asarray(z[k]) for k in z.files})

    @classmethod
    def merge(cls, libs: Sequence["MotionLib"]) -> "MotionLib":
        """Concatenate multiple libraries (reference `merge_multiple_motion_libs`)."""
        out = {}
        frame_fields = ["gts", "grs", "lrs", "grvs", "gravs", "dvs"]
        motion_fields = ["motion_lengths", "motion_num_frames", "motion_dt",
                         "motion_weights", "motion_bodies", "motion_body_scales",
                         "motion_min_verts_h"]
        for f in frame_fields + motion_fields:
            out[f] = jnp.concatenate([getattr(l, f) for l in libs], axis=0)
        nf = out["motion_num_frames"]
        out["length_starts"] = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(nf)[:-1].astype(jnp.int32)])
        out["motion_weights"] = out["motion_weights"] / out["motion_weights"].sum()
        out["key_body_ids"] = libs[0].key_body_ids
        # optional video metadata survives a merge only when every shard
        # carries it (mixed merges drop it rather than misalign frames)
        if all(l.has_kp2d for l in libs):
            out["kp2d"] = jnp.concatenate([l.kp2d for l in libs], axis=0)
            out["cam_extrinsics"] = jnp.concatenate(
                [l.cam_extrinsics for l in libs], axis=0)
        return cls(**out)


def _dof_vels(m: SkeletonMotion) -> np.ndarray:
    """Per-frame dof velocities from local-rotation finite differences
    (`motion_lib.py:443-458`, all-spherical joints → child-frame rotvec rate)."""
    lr = jnp.asarray(m.local_rotation)  # (T, J, 4)
    dt = 1.0 / m.fps
    dq = Q.quat_mul_norm(Q.quat_inverse(lr[:-1]), lr[1:])
    angle, axis = Q.quat_to_angle_axis(dq)
    vel = axis * angle[..., None] / dt              # (T-1, J, 3)
    vel = jnp.concatenate([vel, vel[-1:]], axis=0)  # repeat last
    # drop root (dofs are joints 1..J-1)
    return np.asarray(vel[:, 1:].reshape(vel.shape[0], -1))


# ---------------------------------------------------------------------------
# sampling (pure, device)
# ---------------------------------------------------------------------------

def sample_motions(lib: MotionLib, key, n: int, weights_from_length: bool = True):
    if weights_from_length:
        w = lib.motion_lengths / lib.motion_lengths.sum()
    else:
        w = lib.motion_weights
    return jax.random.choice(key, lib.num_motions, shape=(n,), p=w)


def sample_time(lib: MotionLib, key, motion_ids, truncate_time: Optional[float] = None):
    phase = jax.random.uniform(key, motion_ids.shape)
    lens = lib.motion_lengths[motion_ids]
    if truncate_time is not None:
        lens = jnp.maximum(lens - truncate_time, 0.0)
    return phase * lens


# ---------------------------------------------------------------------------
# state lookup (pure, device, fused into env step)
# ---------------------------------------------------------------------------

def _calc_frame_blend(time, length, num_frames, dt):
    phase = jnp.clip(time / jnp.maximum(length, 1e-6), 0.0, 1.0)
    f0 = (phase * (num_frames - 1)).astype(jnp.int32)
    f1 = jnp.minimum(f0 + 1, num_frames - 1)
    blend = (time - f0 * dt) / jnp.maximum(dt, 1e-9)
    blend = jnp.clip(blend, 0.0, 1.0)
    return f0, f1, blend


def get_motion_state(lib: MotionLib, motion_ids, motion_times,
                     adjust_height: bool = True, ground_tolerance: float = 0.0):
    """Blended motion state at (motion, time): returns a dict with
    root_pos, root_rot, dof_pos, root_vel, root_ang_vel, dof_vel, key_pos,
    rb_pos, rb_rot — matching `motion_lib.py:164-266` semantics.
    """
    lens = lib.motion_lengths[motion_ids]
    nf = lib.motion_num_frames[motion_ids]
    dt = lib.motion_dt[motion_ids]
    f0, f1, blend = _calc_frame_blend(motion_times, lens, nf, dt)
    f0l = f0 + lib.length_starts[motion_ids]
    f1l = f1 + lib.length_starts[motion_ids]
    b = blend[..., None]

    root_pos = (1 - b) * lib.gts[f0l, 0] + b * lib.gts[f1l, 0]
    root_rot = Q.slerp(lib.grs[f0l, 0], lib.grs[f1l, 0], b)
    root_vel = lib.grvs[f0l]
    root_ang_vel = lib.gravs[f0l]
    dof_vel = lib.dvs[f0l]

    be = b[..., None]
    local_rot = Q.slerp(lib.lrs[f0l], lib.lrs[f1l], be)
    dof_pos = Q.quat_to_exp_map(local_rot[:, 1:]).reshape(local_rot.shape[0], -1)

    rb_pos = (1 - be) * lib.gts[f0l] + be * lib.gts[f1l]
    rb_rot = Q.slerp(lib.grs[f0l], lib.grs[f1l], be)

    if adjust_height:
        min_vh = lib.motion_min_verts_h[motion_ids] - ground_tolerance
        root_pos = root_pos.at[..., 2].add(-min_vh)
        rb_pos = rb_pos.at[..., 2].add(-min_vh[..., None])

    key_pos = rb_pos[:, lib.key_body_ids] if lib.key_body_ids.shape[0] else rb_pos[:, :0]

    return dict(root_pos=root_pos, root_rot=root_rot, dof_pos=dof_pos,
                root_vel=root_vel, root_ang_vel=root_ang_vel, dof_vel=dof_vel,
                key_pos=key_pos, rb_pos=rb_pos, rb_rot=rb_rot)
