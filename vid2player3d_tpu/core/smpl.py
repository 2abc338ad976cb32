"""SMPL body model as pure JAX linear blend skinning.

Replaces the reference's runtime use of the external `smplx` package
(`/root/reference/uhc/smpllib/smpl_parser.py:260-497`): betas → shaped template →
joint regression → LBS posing. Weights load from the standard SMPL pkl when
available; `make_synthetic_smpl()` builds a deterministic structure-compatible
body for tests and for machines without the (non-redistributable) SMPL data.

Joint order is SMPL bone order (`smpl_parser.py:10-35`); quats xyzw; pose is
24×3 axis-angle (72-dim), matching `get_joints_verts` (`smpl_parser.py:356`).
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import rot as R
from . import quat as Q

SMPL_BONE_ORDER_NAMES = [
    "Pelvis", "L_Hip", "R_Hip", "Torso", "L_Knee", "R_Knee", "Spine",
    "L_Ankle", "R_Ankle", "Chest", "L_Toe", "R_Toe", "Neck", "L_Thorax",
    "R_Thorax", "Head", "L_Shoulder", "R_Shoulder", "L_Elbow", "R_Elbow",
    "L_Wrist", "R_Wrist", "L_Hand", "R_Hand",
]

SMPL_PARENTS = np.array(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19, 20, 21],
    dtype=np.int32,
)

# MuJoCo humanoid joint order used by the simulator assets
# (`embodied_pose/models/im_network_builder.py:17-24`).
MUJOCO_JOINT_NAMES = [
    "Pelvis", "L_Hip", "L_Knee", "L_Ankle", "L_Toe", "R_Hip", "R_Knee",
    "R_Ankle", "R_Toe", "Torso", "Spine", "Chest", "Neck", "Head", "L_Thorax",
    "L_Shoulder", "L_Elbow", "L_Wrist", "L_Hand", "R_Thorax", "R_Shoulder",
    "R_Elbow", "R_Wrist", "R_Hand",
]
SMPL_2_MUJOCO = np.array([SMPL_BONE_ORDER_NAMES.index(n) for n in MUJOCO_JOINT_NAMES], dtype=np.int32)
MUJOCO_2_SMPL = np.array([MUJOCO_JOINT_NAMES.index(n) for n in SMPL_BONE_ORDER_NAMES], dtype=np.int32)

NUM_JOINTS = 24


def smpl_children_map(parents: np.ndarray = SMPL_PARENTS) -> np.ndarray:
    """First-child map used by the twist-swing IK (`smpl_parser.py:340-350`):
    children[j] = first child of j; Pelvis→Torso(3), Chest(9)→Neck(12)."""
    children = -np.ones_like(parents)
    for i in range(len(parents)):
        p = int(parents[i])
        if p != -1 and children[p] < 0:
            children[p] = i
    children[0] = 3
    children[9] = SMPL_BONE_ORDER_NAMES.index("Neck")
    return children


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class SMPLModel:
    """SMPL parameters as device arrays."""

    v_template: jnp.ndarray  # (V, 3)
    shapedirs: jnp.ndarray  # (V, 3, B)
    J_regressor: jnp.ndarray  # (J, V)
    lbs_weights: jnp.ndarray  # (V, J)
    posedirs: Optional[jnp.ndarray]  # (V, 3, 207) or None

    def tree_flatten(self):
        return (self.v_template, self.shapedirs, self.J_regressor, self.lbs_weights, self.posedirs), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def num_verts(self):
        return self.v_template.shape[0]


def load_smpl_pkl(path: str) -> SMPLModel:
    """Load standard SMPL pkl (basicmodel_*.pkl) into device arrays."""
    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")

    def dense(x):
        if hasattr(x, "todense"):
            x = np.asarray(x.todense())
        return np.asarray(x, dtype=np.float32)

    return SMPLModel(
        v_template=jnp.asarray(dense(data["v_template"])),
        shapedirs=jnp.asarray(dense(data["shapedirs"])[..., :10]),
        J_regressor=jnp.asarray(dense(data["J_regressor"])),
        lbs_weights=jnp.asarray(dense(data["weights"])),
        posedirs=jnp.asarray(dense(data["posedirs"])) if "posedirs" in data else None,
    )


def make_synthetic_smpl(num_verts: int = 384, seed: int = 0) -> SMPLModel:
    """Deterministic structure-compatible body model for tests / data-free machines.

    Joints form a plausible humanoid rest skeleton (y-up, like real SMPL);
    vertices are placed around bone segments with distance-based skinning weights
    so LBS, mesh offsets, and min-vert-height computations behave sensibly.
    """
    rng = np.random.RandomState(seed)

    # plausible SMPL rest joints in the SMPL canonical frame (y up, meters)
    joints = np.array([
        [0.00, 0.00, 0.00],    # Pelvis
        [0.08, -0.08, 0.00],   # L_Hip
        [-0.08, -0.08, 0.00],  # R_Hip
        [0.00, 0.12, 0.00],    # Torso
        [0.10, -0.48, 0.00],   # L_Knee
        [-0.10, -0.48, 0.00],  # R_Knee
        [0.00, 0.25, 0.00],    # Spine
        [0.10, -0.88, -0.02],  # L_Ankle
        [-0.10, -0.88, -0.02], # R_Ankle
        [0.00, 0.32, 0.00],    # Chest
        [0.11, -0.94, 0.10],   # L_Toe
        [-0.11, -0.94, 0.10],  # R_Toe
        [0.00, 0.50, 0.00],    # Neck
        [0.07, 0.42, 0.00],    # L_Thorax
        [-0.07, 0.42, 0.00],   # R_Thorax
        [0.00, 0.60, 0.03],    # Head
        [0.17, 0.42, 0.00],    # L_Shoulder
        [-0.17, 0.42, 0.00],   # R_Shoulder
        [0.42, 0.40, 0.00],    # L_Elbow
        [-0.42, 0.40, 0.00],   # R_Elbow
        [0.66, 0.40, 0.00],    # L_Wrist
        [-0.66, 0.40, 0.00],   # R_Wrist
        [0.74, 0.40, 0.00],    # L_Hand
        [-0.74, 0.40, 0.00],   # R_Hand
    ], dtype=np.float32)

    # vertices scattered around joints
    per_joint = num_verts // NUM_JOINTS
    verts, w_rows = [], []
    for j in range(NUM_JOINTS):
        pts = joints[j] + rng.randn(per_joint, 3).astype(np.float32) * 0.05
        verts.append(pts)
        w = np.zeros((per_joint, NUM_JOINTS), dtype=np.float32)
        w[:, j] = 0.8
        p = int(SMPL_PARENTS[j])
        if p >= 0:
            w[:, p] = 0.2
        else:
            w[:, j] = 1.0
        w_rows.append(w)
    rem = num_verts - per_joint * NUM_JOINTS
    if rem:
        verts.append(joints[0] + rng.randn(rem, 3).astype(np.float32) * 0.05)
        w = np.zeros((rem, NUM_JOINTS), dtype=np.float32)
        w[:, 0] = 1.0
        w_rows.append(w)
    v_template = np.concatenate(verts, 0)
    lbs_weights = np.concatenate(w_rows, 0)
    lbs_weights /= lbs_weights.sum(-1, keepdims=True)

    # J_regressor: recover exact joints from the vertex cloud (least-squares-free:
    # each joint = mean of its own vertices, corrected to hit the true joint)
    J_reg = np.zeros((NUM_JOINTS, num_verts), dtype=np.float32)
    off = 0
    for j in range(NUM_JOINTS):
        n = per_joint if j < NUM_JOINTS else rem
        J_reg[j, off:off + per_joint] = 1.0 / per_joint
        off += per_joint
    # shapedirs: smooth random directions, scaled small
    shapedirs = (rng.randn(num_verts, 3, 10) * 0.01).astype(np.float32)

    return SMPLModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        J_regressor=jnp.asarray(J_reg),
        lbs_weights=jnp.asarray(lbs_weights),
        posedirs=None,
    )


def find_smpl_model(data_dir: str = "data/smpl", gender: str = "neutral") -> SMPLModel:
    """Load real SMPL weights if present, else the synthetic body."""
    names = {
        "neutral": ["SMPL_NEUTRAL.pkl", "basicmodel_neutral_lbs_10_207_0_v1.1.0.pkl",
                    "basicModel_neutral_lbs_10_207_0_v1.0.0.pkl"],
        "male": ["SMPL_MALE.pkl", "basicmodel_m_lbs_10_207_0_v1.1.0.pkl"],
        "female": ["SMPL_FEMALE.pkl", "basicmodel_f_lbs_10_207_0_v1.1.0.pkl"],
    }[gender]
    for n in names:
        p = os.path.join(data_dir, n)
        if os.path.exists(p):
            return load_smpl_pkl(p)
    return make_synthetic_smpl()


# ---------------------------------------------------------------------------
# forward model
# ---------------------------------------------------------------------------

def shaped_vertices(model: SMPLModel, betas):
    """betas (..., B) → shaped template vertices (..., V, 3)."""
    return model.v_template + jnp.einsum("vcb,...b->...vc", model.shapedirs, betas)


def rest_joints(model: SMPLModel, betas):
    """betas (..., B) → rest joint positions (..., J, 3) in SMPL order."""
    v = shaped_vertices(model, betas)
    return jnp.einsum("jv,...vc->...jc", model.J_regressor, v)


def batch_rigid_transform(rot_mats, joints, parents=SMPL_PARENTS):
    """FK over the SMPL tree with per-joint rotation matrices.

    rot_mats (..., J, 3, 3), joints (..., J, 3) rest positions.
    Returns (posed_joints (..., J, 3), rel_transforms (..., J, 4, 4)) —
    the same contract as `utils/hybrik.py:596 batch_rigid_transform`.
    """
    parents = np.asarray(parents)
    J = joints.shape[-2]
    rel = joints - jnp.where(
        (parents >= 0)[:, None], joints[..., np.maximum(parents, 0), :], 0.0)

    def make_T(Rm, t):
        top = jnp.concatenate([Rm, t[..., None]], axis=-1)
        bot = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0]), top.shape[:-2] + (1, 4))
        return jnp.concatenate([top, bot], axis=-2)

    T_glob = [make_T(rot_mats[..., 0, :, :], rel[..., 0, :])]
    for j in range(1, J):
        p = int(parents[j])
        T_local = make_T(rot_mats[..., j, :, :], rel[..., j, :])
        T_glob.append(T_glob[p] @ T_local)
    T = jnp.stack(T_glob, axis=-3)

    posed = T[..., :3, 3]
    # subtract the skinned contribution of rest joints: T_rel = T - T·[j;0]
    joints_h = jnp.concatenate([joints, jnp.zeros_like(joints[..., :1])], axis=-1)
    correction = jnp.einsum("...jab,...jb->...ja", T, joints_h)
    rel_T = T.at[..., :3, 3].add(-correction[..., :3])
    return posed, rel_T


def lbs(model: SMPLModel, betas, pose_aa, trans=None):
    """Full SMPL forward: betas (..., 10), pose_aa (..., 72) → (verts, joints).

    Linear blend skinning without pose blendshapes by default (the reference
    uses them through smplx; posedirs are applied when loaded from pkl).
    """
    leading = pose_aa.shape[:-1]
    v_shaped = shaped_vertices(model, betas)
    J = rest_joints(model, betas)
    aa = pose_aa.reshape(leading + (NUM_JOINTS, 3))
    rot_mats = R.angle_axis_to_rotmat(aa)

    if model.posedirs is not None:
        ident = jnp.eye(3)
        pose_feat = (rot_mats[..., 1:, :, :] - ident).reshape(leading + (207,))
        v_shaped = v_shaped + jnp.einsum("vcp,...p->...vc", model.posedirs, pose_feat)

    posed_joints, rel_T = batch_rigid_transform(rot_mats, J)
    # skinning
    T = jnp.einsum("vj,...jab->...vab", model.lbs_weights, rel_T)
    v_h = jnp.concatenate([v_shaped, jnp.ones_like(v_shaped[..., :1])], axis=-1)
    verts = jnp.einsum("...vab,...vb->...va", T, v_h)[..., :3]

    if trans is not None:
        verts = verts + trans[..., None, :]
        posed_joints = posed_joints + trans[..., None, :]
    return verts, posed_joints
