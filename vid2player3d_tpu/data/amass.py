"""AMASS → MotionLib conversion (TPU-native `uhc/utils/convert_amass_isaac.py`).

Converts SMPL pose sequences (pose_aa (T,72), trans (T,3), betas, gender) into
`SkeletonMotion`s on the per-shape mujoco-ordered skeleton and packs them into a
`MotionLib` (reference flow: `convert_amass_isaac.py:95-176`). Pure host-side
numpy/JAX — no MJCF files, no Isaac assets.
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..core import quat as Q
from ..core import smpl as S
from ..core.skeleton import SkeletonMotion, SkeletonTree
from ..physics.asset import smpl_to_world_rest
from .motion_lib import MotionLib

# default key bodies for imitation rewards (reference `amass_im.yaml` keyBodies)
DEFAULT_KEY_BODIES = ("L_Ankle", "R_Ankle", "L_Wrist", "R_Wrist")


def humanoid_skeleton_tree(smpl_model: S.SMPLModel, betas: np.ndarray,
                           scale: float = 1.0) -> SkeletonTree:
    """Mujoco-ordered skeleton tree for one body shape (betas (10,))."""
    joints = np.asarray(S.rest_joints(smpl_model, jnp.asarray(betas[None])))[0] * scale
    m2s = S.SMPL_2_MUJOCO
    joints_mj = joints[m2s]
    from ..physics.asset import _mujoco_parents

    parents = _mujoco_parents()
    local_t = np.zeros_like(joints_mj)
    for j in range(1, 24):
        local_t[j] = joints_mj[j] - joints_mj[parents[j]]
    local_t[0] = joints_mj[0]
    return SkeletonTree(tuple(S.MUJOCO_JOINT_NAMES), parents,
                        jnp.asarray(local_t.astype(np.float32)))


def convert_amass_sequence(
    smpl_model: S.SMPLModel,
    pose_aa: np.ndarray,      # (T, 72) axis-angle, SMPL joint order
    trans: np.ndarray,        # (T, 3) world translation (z-up AMASS frame)
    betas: np.ndarray,        # (10,)
    gender: str = "neutral",
    fps: float = 30.0,
    body_scale: float = 1.0,
    min_verts_frames: int = 16,
) -> dict:
    """One AMASS sequence → SkeletonMotion + metadata dict.

    Matches `convert_amass_isaac.py`: per-joint exp-map → local quats in mujoco
    order; root = SMPL pelvis world pose; min_verts_h from posed SMPL vertices.
    """
    T = pose_aa.shape[0]
    pose_aa = np.asarray(pose_aa, dtype=np.float32).reshape(T, 24, 3)
    trans = np.asarray(trans, dtype=np.float32)

    tree = humanoid_skeleton_tree(smpl_model, betas, body_scale)
    local_q_smpl = np.asarray(Q.exp_map_to_quat(jnp.asarray(pose_aa)))  # (T,24,4)
    local_q = local_q_smpl[:, S.SMPL_2_MUJOCO]

    # pelvis world position = rest pelvis + trans (SMPL LBS root convention)
    j0 = np.asarray(tree.local_translation)[0]
    root_t = trans * body_scale + j0

    motion = SkeletonMotion(tree=tree, local_rotation=local_q.astype(np.float32),
                            root_translation=root_t.astype(np.float32), fps=fps)

    # min world-z over posed vertices, subsampled frames (betas broadcast to
    # the frame batch — lbs requires matching leading dims)
    idx = np.linspace(0, T - 1, min(min_verts_frames, T)).astype(int)
    verts, _ = S.lbs(smpl_model,
                     jnp.broadcast_to(jnp.asarray(betas), (len(idx), 10)),
                     jnp.asarray(pose_aa[idx].reshape(len(idx), 72)),
                     trans=jnp.asarray(trans[idx] * body_scale))
    min_verts_h = float(np.asarray(verts)[..., 2].min())

    gender_code = {"neutral": 0, "male": 1, "female": 2}[gender]
    motion_body = np.concatenate([[gender_code], betas]).astype(np.float32)
    return dict(motion=motion, motion_body=motion_body, body_scale=body_scale,
                min_verts_h=min_verts_h)


def build_motion_lib(entries: Sequence[dict],
                     key_bodies: Sequence[str] = DEFAULT_KEY_BODIES) -> MotionLib:
    """Pack converted sequences into a MotionLib."""
    key_ids = [S.MUJOCO_JOINT_NAMES.index(n) for n in key_bodies]
    return MotionLib.from_motions(
        [e["motion"] for e in entries],
        motion_bodies=np.stack([e["motion_body"] for e in entries]),
        body_scales=np.array([e["body_scale"] for e in entries]),
        min_verts_h=np.array([e["min_verts_h"] for e in entries]),
        key_body_ids=key_ids,
    )


def convert_amass_dir(amass_dir: str, smpl_model: Optional[S.SMPLModel] = None,
                      out_path: Optional[str] = None, max_seqs: Optional[int] = None,
                      target_fps: float = 30.0) -> MotionLib:
    """Convert a directory of AMASS .npz files (CLI equivalent of
    `convert_amass_isaac.py`). Downsamples to target_fps."""
    if smpl_model is None:
        smpl_model = S.find_smpl_model()
    files = sorted(glob.glob(os.path.join(amass_dir, "**", "*.npz"), recursive=True))
    if max_seqs:
        files = files[:max_seqs]
    entries = []
    for f in files:
        try:
            data = np.load(f)
            poses = np.asarray(data["poses"])  # (T, 156) SMPLH or (T,72)
            fps = float(data.get("mocap_framerate", data.get("mocap_frame_rate", 60.0)))
            trans = np.asarray(data["trans"])
            betas = np.asarray(data["betas"])[:10]
            gender = str(data.get("gender", "neutral"))
        except Exception:
            continue
        skip = max(1, int(round(fps / target_fps)))
        poses = poses[::skip]
        trans = trans[::skip]
        if poses.shape[0] < 10:
            continue
        # SMPLH 156-dim → SMPL 72: body pose 63 + root 3, hands → identity
        if poses.shape[1] >= 156:
            pose72 = np.zeros((poses.shape[0], 72), dtype=np.float32)
            pose72[:, :66] = poses[:, :66]
        else:
            pose72 = poses[:, :72].astype(np.float32)
        if gender not in ("neutral", "male", "female"):
            gender = "neutral"
        entries.append(convert_amass_sequence(
            smpl_model, pose72, trans, betas.astype(np.float32), gender,
            fps=fps / skip))
    lib = build_motion_lib(entries)
    if out_path:
        lib.save(out_path)
    return lib
