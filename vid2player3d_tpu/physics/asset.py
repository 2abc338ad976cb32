"""Parametric asset compiler: SMPL betas → articulation model arrays.

Replaces the reference's per-body-shape MuJoCo XML generation pipeline
(`uhc/smpllib/smpl_local_robot.py:1080-1458` + Isaac `load_asset`): instead of
writing one MJCF per unique beta and loading it through C++, we compute the
model quantities (joint offsets, masses, inertias, contact geometry) directly
from the SMPL body as arrays with a leading env axis — heterogeneous bodies
under ONE compiled program, no recompilation per shape (SURVEY.md §7).

Bodies are in MuJoCo joint order (`im_network_builder.py:17-24`); PD gains and
torque limits follow the reference's GAINS table
(`uhc/khrylib/mocap/skeleton_mesh_local.py:9-33`).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..core import smpl as S
from .model import ArticulationModel

# per-joint [kp, kd, gear, torque_limit] (skeleton_mesh_local.py:9-33)
GAINS = {
    "L_Hip": (500, 50, 500), "L_Knee": (500, 50, 500), "L_Ankle": (400, 40, 500),
    "L_Toe": (200, 20, 500), "R_Hip": (500, 50, 500), "R_Knee": (500, 50, 500),
    "R_Ankle": (400, 40, 500), "R_Toe": (200, 20, 500), "Torso": (1000, 100, 500),
    "Spine": (1000, 100, 500), "Chest": (1000, 100, 500), "Neck": (100, 10, 250),
    "Head": (100, 10, 250), "L_Thorax": (400, 40, 500), "L_Shoulder": (400, 40, 250),
    "L_Elbow": (300, 30, 150), "L_Wrist": (100, 10, 150), "L_Hand": (100, 10, 150),
    "R_Thorax": (400, 40, 150), "R_Shoulder": (400, 40, 250), "R_Elbow": (300, 30, 150),
    "R_Wrist": (100, 10, 150), "R_Hand": (100, 10, 150),
}

HUMAN_DENSITY = 1000.0  # kg/m^3
DEFAULT_HUMANOID_MASS = 90.0  # reference normalization (`humanoid_smpl_im.py:379`)

# Frame convention (matches the reference MJCF assets): body frames ARE the SMPL
# canonical frames (y-up within a frame); the standing humanoid's world root
# orientation is the fixed base rotation quat [0.5, 0.5, 0.5, 0.5] (xyzw), whose
# matrix maps body y → world z (`remove_base_rot`, `humanoid_smpl_im.py:766-770`).
# R maps body(SMPL) coords → world coords at rest: x_w = z_b, y_w = x_b, z_w = y_b.
BASE_ROT_XYZW = np.array([0.5, 0.5, 0.5, 0.5], dtype=np.float32)
_R_BASE = np.array([[0.0, 0.0, 1.0],
                    [1.0, 0.0, 0.0],
                    [0.0, 1.0, 0.0]], dtype=np.float32)


def smpl_to_world_rest(v: np.ndarray) -> np.ndarray:
    """Rotate SMPL-frame vectors to world frame at the rest (standing) pose."""
    return v @ _R_BASE.T


def default_self_collision_pairs(names) -> tuple:
    """Curated humanoid self-collision pair list (contact-sphere indices;
    sphere j of the first 24 belongs to body j).

    The reference enables humanoid self-collision via per-shape PhysX filter
    bitmasks (`humanoid_smpl_im_mvae.py:388-417`, asset XML contact defs) —
    everything collides except parent/child. A penalty engine pays per pair
    every substep, so we keep the pairs that matter behaviorally: the arms
    (elbow/wrist/hand) against the trunk (torso/spine/chest/head) and the
    thighs, and the two arms against each other — the cases where a swing
    or a crossover step would otherwise pass limbs through the body."""
    arms = [f"{s}_{p}" for s in ("L", "R") for p in ("Elbow", "Wrist", "Hand")]
    trunk = ["Torso", "Spine", "Chest", "Head", "L_Hip", "R_Hip",
             "L_Knee", "R_Knee"]
    idx = {n: i for i, n in enumerate(names)}
    pairs = []
    for a in arms:
        for t in trunk:
            pairs.append((idx[a], idx[t]))
    for a in ("L_Elbow", "L_Wrist", "L_Hand"):
        for b in ("R_Elbow", "R_Wrist", "R_Hand"):
            pairs.append((idx[a], idx[b]))
    # knees against each other (crossover steps)
    pairs.append((idx["L_Knee"], idx["R_Knee"]))
    return tuple(pairs)


def build_humanoid_model(
    smpl_model: S.SMPLModel,
    betas: np.ndarray,
    gender: Optional[np.ndarray] = None,
    scale: Optional[np.ndarray] = None,
    kp_scale: float = 1.0,
    kd_scale: float = 1.0,
    self_collision: bool = False,
) -> ArticulationModel:
    """betas (N, 10) [+ optional per-env scale (N,)] → ArticulationModel with
    per-env joint offsets / masses / inertias / contact spheres.

    Host-side (numpy) — runs once at env construction, never in the step path.
    """
    betas = np.asarray(betas, dtype=np.float32)
    N = betas.shape[0]
    if scale is None:
        scale = np.ones(N, dtype=np.float32)
    scale = np.asarray(scale, dtype=np.float32)

    # rest joints and shaped vertices, kept in SMPL/body coords (y-up in frame)
    verts = np.asarray(S.shaped_vertices(smpl_model, jnp.asarray(betas))) * scale[:, None, None]
    joints = np.asarray(S.rest_joints(smpl_model, jnp.asarray(betas))) * scale[:, None, None]

    # reorder to mujoco body order
    m2s = S.SMPL_2_MUJOCO  # mujoco idx -> smpl idx
    joints_mj = joints[:, m2s]  # (N,24,3)
    parents_mj = _mujoco_parents()

    # joint offsets: child joint position relative to parent joint
    joint_pos = np.zeros_like(joints_mj)
    for j in range(1, 24):
        joint_pos[:, j] = joints_mj[:, j] - joints_mj[:, parents_mj[j]]
    joint_pos[:, 0] = 0.0

    # vertex→bone assignment by max skinning weight (smpl order → mujoco)
    w = np.asarray(smpl_model.lbs_weights)  # (V,24) smpl order
    bone_of_vert_smpl = np.argmax(w, axis=-1)  # (V,)
    smpl2mj = np.empty(24, dtype=np.int64)
    smpl2mj[m2s] = np.arange(24)
    bone_of_vert = smpl2mj[bone_of_vert_smpl]  # mujoco body index per vertex

    body_mass = np.zeros((N, 24), dtype=np.float32)
    body_com = np.zeros((N, 24, 3), dtype=np.float32)
    body_inertia = np.zeros((N, 24, 3, 3), dtype=np.float32)
    geom_radius = np.zeros((N, 24), dtype=np.float32)
    geom_center = np.zeros((N, 24, 3), dtype=np.float32)

    for j in range(24):
        sel = bone_of_vert == j
        if sel.sum() < 4:
            # tiny bodies: nominal point mass at the joint
            body_mass[:, j] = 0.2
            body_inertia[:, j] = np.eye(3) * 1e-4
            geom_radius[:, j] = 0.03
            continue
        pts = verts[:, sel] - joints_mj[:, j:j + 1]  # body-frame points (N,P,3)
        com = pts.mean(axis=1)
        centered = pts - com[:, None]
        cov = np.einsum("npi,npj->nij", centered, centered) / pts.shape[1]
        evals, evecs = np.linalg.eigh(cov)
        semi = np.sqrt(np.maximum(5.0 * evals, 1e-8))  # uniform-ellipsoid fit
        vol = 4.0 / 3.0 * np.pi * semi.prod(axis=-1)
        mass = HUMAN_DENSITY * vol
        # ellipsoid inertia in principal frame, rotated to body frame
        a2, b2, c2 = semi[:, 0] ** 2, semi[:, 1] ** 2, semi[:, 2] ** 2
        I_p = np.zeros((N, 3, 3), dtype=np.float32)
        I_p[:, 0, 0] = mass / 5.0 * (b2 + c2)
        I_p[:, 1, 1] = mass / 5.0 * (a2 + c2)
        I_p[:, 2, 2] = mass / 5.0 * (a2 + b2)
        I_b = np.einsum("nab,nbc,ndc->nad", evecs, I_p, evecs)
        body_mass[:, j] = mass
        body_com[:, j] = com
        body_inertia[:, j] = I_b
        geom_center[:, j] = com
        geom_radius[:, j] = semi.min(axis=-1)

    # contact spheres: one per body at the geom center, plus fore/heel foot spheres
    contact_body = []
    contact_offset = []
    contact_radius = []
    names = tuple(S.MUJOCO_JOINT_NAMES)
    for j in range(24):
        contact_body.append(j)
        contact_offset.append(geom_center[:, j])
        contact_radius.append(geom_radius[:, j])
    for foot in ("L_Ankle", "R_Ankle"):
        j = names.index(foot)
        toe_j = names.index(foot.split("_")[0] + "_Toe")
        toe_dir = joint_pos[:, toe_j]  # ankle-frame direction to toe
        # heel: opposite the toe; ball: 70% toward toe; both near the sole.
        # body frames are SMPL-oriented: "down" at rest is -y in the body frame.
        sole_y = geom_center[:, j, 1] - geom_radius[:, j] * 0.5
        for frac in (-0.35, 0.7):
            off = geom_center[:, j] + frac * toe_dir
            off[:, 1] = sole_y
            contact_body.append(j)
            contact_offset.append(off.astype(np.float32))
            contact_radius.append(np.full(N, 0.02, dtype=np.float32))

    contact_offset = np.stack(contact_offset, axis=1)
    contact_radius = np.stack(contact_radius, axis=1)

    # PD gains in mujoco order, scaled by body mass ratio (`humanoid_smpl_im.py:376-385`)
    total_mass = body_mass.sum(axis=1)  # (N,)
    pd_scale = total_mass / DEFAULT_HUMANOID_MASS
    kp = np.zeros((N, 23), dtype=np.float32)
    kd = np.zeros((N, 23), dtype=np.float32)
    torque_lim = np.zeros((N, 23), dtype=np.float32)
    for j in range(1, 24):
        g = GAINS[names[j]]
        kp[:, j - 1] = g[0] * pd_scale * kp_scale
        kd[:, j - 1] = g[1] * pd_scale * kd_scale
        torque_lim[:, j - 1] = g[2]

    return ArticulationModel(
        parents=tuple(parents_mj.tolist()),
        names=names,
        collision_pairs=default_self_collision_pairs(names)
        if self_collision else (),
        joint_pos=jnp.asarray(joint_pos),
        body_com=jnp.asarray(body_com),
        body_mass=jnp.asarray(body_mass),
        body_inertia=jnp.asarray(body_inertia),
        kp=jnp.asarray(kp),
        kd=jnp.asarray(kd),
        torque_lim=jnp.asarray(torque_lim),
        armature=jnp.full((N, 23), 0.02, dtype=jnp.float32),
        contact_body=tuple(contact_body),
        contact_offset=jnp.asarray(contact_offset),
        contact_radius=jnp.asarray(contact_radius),
    )


def _mujoco_parents() -> np.ndarray:
    """Parent indices in mujoco body order, derived from SMPL_PARENTS."""
    m2s = S.SMPL_2_MUJOCO
    smpl2mj = np.empty(24, dtype=np.int64)
    smpl2mj[m2s] = np.arange(24)
    parents = np.zeros(24, dtype=np.int32)
    parents[0] = -1
    for mj in range(1, 24):
        sp_idx = m2s[mj]
        sp_parent = S.SMPL_PARENTS[sp_idx]
        parents[mj] = smpl2mj[sp_parent]
    return parents


def min_verts_height(smpl_model: S.SMPLModel, betas: np.ndarray,
                     pose_aa: Optional[np.ndarray] = None) -> np.ndarray:
    """Lowest vertex height of the (rest-posed) body in sim frame — the
    height-adjustment term baked into MotionLib (`motion_lib.py:224-227`)."""
    betas = np.asarray(betas, dtype=np.float32)
    if pose_aa is None:
        verts = np.asarray(S.shaped_vertices(smpl_model, jnp.asarray(betas)))
    else:
        verts, _ = S.lbs(smpl_model, jnp.asarray(betas), jnp.asarray(pose_aa))
        verts = np.asarray(verts)
    return smpl_to_world_rest(verts)[..., 2].min(axis=-1)


def default_humanoid_state(model: ArticulationModel, num_envs: int,
                           root_h: float = 0.89):
    """Standing rest state: identity joints, root at base rotation (the SMPL
    body-frame → world-frame rest orientation), matching the reference's
    start pose (`humanoid_smpl.py:362-365` char_h=0.89 + base-rotated frames)."""
    import jax.numpy as jnp
    from .model import ArticulationState

    st = ArticulationState.zeros(num_envs, model.num_bodies, root_h=root_h)
    base = jnp.tile(jnp.asarray(BASE_ROT_XYZW), (num_envs, 1))
    return ArticulationState(st.root_pos, base, st.root_vel, st.joint_quat, st.joint_omega)
