"""Jit-compiled batched articulated rigid-body dynamics (Featherstone ABA).

This is the TPU-native replacement for Isaac Gym/PhysX `gym.simulate`
(`base_task.py:450-454`): a pure function
    substep(model, state, joint_torque, root_force, ext_forces, dt) -> state
unrolled over the (static, ≤26-body) kinematic tree and batched over envs with
vmap-style broadcasting. All control flow is trace-time; shapes are static.

Pipeline per substep:
  1. FK → body world poses/velocities
  2. penalty ground contacts → per-body external spatial forces
  3. PD joint torques (exp-map target difference, matching the reference's
     `pd_torque = (pd_tar - dof_pos) * stiffness`, `humanoid_smpl_im.py:135`)
  4. ABA forward dynamics → accelerations
  5. semi-implicit Euler integrate (quaternion joints, body-frame twists)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import quat as Q
from . import spatial as sp
from .model import ArticulationModel, ArticulationState, ContactParams, GRAVITY


# ---------------------------------------------------------------------------
# forward kinematics: generalized state → world body poses & velocities
# ---------------------------------------------------------------------------

def fk_world(model: ArticulationModel, state: ArticulationState):
    """Returns body_pos (N,J,3), body_quat (N,J,4), body_vel_w (N,J,3),
    body_ang_vel_w (N,J,3): world positions of body origins, world orientations,
    world linear velocity of body origin, world angular velocity.
    """
    parents = model.parents
    J = model.num_bodies

    pos = [state.root_pos]
    quat = [state.root_quat]
    # world-frame angular & linear velocity of body origin
    w0 = Q.quat_rotate(state.root_quat, state.root_vel[..., :3])
    v0 = Q.quat_rotate(state.root_quat, state.root_vel[..., 3:])
    ang = [w0]
    lin = [v0]

    for j in range(1, J):
        p = parents[j]
        off_w = Q.quat_rotate(quat[p], model.joint_pos[:, j])
        pos_j = pos[p] + off_w
        quat_j = Q.quat_mul_norm(quat[p], state.joint_quat[:, j - 1])
        w_j = ang[p] + Q.quat_rotate(quat_j, state.joint_omega[:, j - 1])
        v_j = lin[p] + jnp.cross(ang[p], off_w)
        pos.append(pos_j)
        quat.append(quat_j)
        ang.append(w_j)
        lin.append(v_j)

    return (jnp.stack(pos, axis=1), jnp.stack(quat, axis=1),
            jnp.stack(lin, axis=1), jnp.stack(ang, axis=1))


# ---------------------------------------------------------------------------
# contacts: penalty sphere-vs-ground
# ---------------------------------------------------------------------------

def ground_contacts(model: ArticulationModel, body_pos, body_quat, body_lin, body_ang,
                    params: ContactParams):
    """Per-body world-frame contact wrench from ground-plane penalty contacts.

    Returns (force_w (N,J,3), torque_w (N,J,3), contact_force_per_body (N,J,3)).
    The last output mirrors Isaac's net-contact-force tensor used for
    termination/ball logic (`humanoid_smpl.py:735-743`).
    """
    N = body_pos.shape[0]
    J = model.num_bodies
    cb = np.asarray(model.contact_body)

    cp_body_pos = body_pos[:, cb]       # (N,P,3)
    cp_body_quat = body_quat[:, cb]
    cp_body_lin = body_lin[:, cb]
    cp_body_ang = body_ang[:, cb]

    # world contact point and its velocity
    off_w = Q.quat_rotate(cp_body_quat, model.contact_offset)
    c_w = cp_body_pos + off_w
    v_c = cp_body_lin + jnp.cross(cp_body_ang, off_w)

    # lowest point of sphere
    pen = model.contact_radius - c_w[..., 2]          # >0 when penetrating
    pen = jnp.maximum(pen, 0.0)
    active = pen > 0.0

    vn = v_c[..., 2]
    fn = params.kn * pen - params.dn * vn * (pen > 0)
    fn = jnp.maximum(fn, 0.0) * active

    vt = v_c.at[..., 2].set(0.0)
    vt_norm = jnp.linalg.norm(vt, axis=-1)
    ft_mag = jnp.minimum(params.mu * fn, params.kt * vt_norm)
    ft = -vt / jnp.maximum(vt_norm, params.vt_eps)[..., None] * ft_mag[..., None]

    f_c = ft.at[..., 2].add(fn)                       # (N,P,3) world contact force

    # scatter to bodies: force at contact point → force+torque at body origin
    torque_c = jnp.cross(c_w - cp_body_pos, f_c)
    force_b = jnp.zeros((N, J, 3), f_c.dtype).at[:, cb].add(f_c)
    torque_b = jnp.zeros((N, J, 3), f_c.dtype).at[:, cb].add(torque_c)
    return force_b, torque_b, force_b


# ---------------------------------------------------------------------------
# PD control
# ---------------------------------------------------------------------------

def pd_torques(model: ArticulationModel, state: ArticulationState, pd_targets, dt: float):
    """Stable-PD proportional torque in exp-map coords (Tan et al. 2011):
        τ_p = kp · (q_tar − (q + dt·ω))
    The damping term −kd·(ω + dt·q̈) is handled IMPLICITLY inside `aba` (the
    dt·q̈ part is folded into the joint-space inertia), which keeps the
    reference's stiff gains (kp≈500 on gram-scale hand links) stable at large
    timesteps — PhysX integrates its joint drives implicitly too.

    pd_targets (N, (J-1)*3). Torque (N, J-1, 3) in child-joint coords.
    """
    J = model.num_bodies
    tar = pd_targets.reshape(pd_targets.shape[0], J - 1, 3)
    cur = Q.quat_to_exp_map(state.joint_quat)
    err = tar - cur - dt * state.joint_omega
    tau = model.kp[..., None] * err
    lim = model.torque_lim[..., None]
    return jnp.clip(tau, -lim, lim)


# ---------------------------------------------------------------------------
# ABA forward dynamics
# ---------------------------------------------------------------------------

def aba(model: ArticulationModel, state: ArticulationState, joint_torque,
        ext_force_w, ext_torque_w, body_quat, dt: float = 0.0,
        fixed_base: bool = False):
    """Articulated Body Algorithm over the static tree.

    joint_torque (N,J-1,3) in child coords (stable-PD proportional part);
    ext_*_w (N,J,3) world-frame external wrenches at body origins (contacts,
    residual root forces; gravity is added here). Joint damping kd is applied
    implicitly: D += (armature + dt·kd)·I₃ and u −= kd·ω.

    Returns (a_root (N,6) spatial accel in root coords, qdd (N,J-1,3)).
    """
    parents = model.parents
    J = model.num_bodies
    N = state.root_pos.shape[0]

    # joint rotations/offsets
    E = [None] * J      # parent→child coord rotation (3,3)
    p_off = [None] * J  # child origin in parent frame
    v = [None] * J      # spatial velocity, body coords
    c = [None] * J      # velocity-product acceleration
    IA = [None] * J
    pA = [None] * J

    # per-body spatial inertia (body frame)
    I_sp = sp.spatial_inertia(model.body_mass, model.body_com, model.body_inertia)

    # gravity as external force at COM: world force m*g, world torque r_com×F
    g = jnp.asarray(GRAVITY)

    v[0] = state.root_vel
    c[0] = jnp.zeros_like(v[0])

    # external wrench on each body in body coords (incl. gravity)
    f_ext = [None] * J
    for j in range(J):
        q_j = body_quat[:, j]
        m_j = model.body_mass[:, j:j + 1]
        fg_w = m_j * g                                       # (N,3)
        com_w = Q.quat_rotate(q_j, model.body_com[:, j])
        tg_w = jnp.cross(com_w, fg_w)
        f_w = ext_force_w[:, j] + fg_w
        t_w = ext_torque_w[:, j] + tg_w
        f_b = Q.quat_rotate_inverse(q_j, f_w)
        t_b = Q.quat_rotate_inverse(q_j, t_w)
        f_ext[j] = jnp.concatenate([t_b, f_b], axis=-1)      # [n; f]

    # --- pass 1: velocities, bias forces
    for j in range(1, J):
        p = parents[j]
        E[j] = jnp.swapaxes(Q.quat_to_rotmat(state.joint_quat[:, j - 1]), -1, -2)
        p_off[j] = jnp.broadcast_to(model.joint_pos[:, j], (N, 3))
        vJ = jnp.concatenate([state.joint_omega[:, j - 1], jnp.zeros((N, 3))], axis=-1)
        v[j] = sp.xform_motion(E[j], p_off[j], v[p]) + vJ
        c[j] = sp.cross_motion(v[j], vJ)

    for j in range(J):
        IA[j] = jnp.broadcast_to(I_sp[:, j], (N, 6, 6))
        Iv = jnp.einsum("...ij,...j->...i", IA[j], v[j])
        pA[j] = sp.cross_force(v[j], Iv) - f_ext[j]

    # --- pass 2: backward, eliminate joints
    U = [None] * J
    Dinv = [None] * J
    u = [None] * J
    for j in range(J - 1, 0, -1):
        p = parents[j]
        Uj = IA[j][..., :, :3]                               # IA @ S, S = [I3;0]
        d_diag = model.armature[:, j - 1] + dt * model.kd[:, j - 1]
        Dj = IA[j][..., :3, :3] + d_diag[..., None, None] * jnp.eye(3)
        uj = (joint_torque[:, j - 1]
              - model.kd[:, j - 1][..., None] * state.joint_omega[:, j - 1]
              - pA[j][..., :3])
        Dinv_j = sp.inv33(Dj)
        U[j], Dinv[j], u[j] = Uj, Dinv_j, uj

        Ia = IA[j] - Uj @ Dinv_j @ jnp.swapaxes(Uj, -1, -2)
        pa = pA[j] + jnp.einsum("...ij,...j->...i", Ia, c[j]) \
            + jnp.einsum("...ij,...jk,...k->...i", Uj, Dinv_j, uj)
        IA[p] = IA[p] + sp.xform_inertia_to_parent(E[j], p_off[j], Ia)
        pA[p] = pA[p] + sp.xform_force_to_parent(E[j], p_off[j], pa)

    # --- base acceleration
    a = [None] * J
    if fixed_base:
        a[0] = jnp.zeros_like(pA[0])
    else:
        a[0] = sp.solve_spd66(IA[0], -pA[0])

    # --- pass 3: forward, joint accelerations
    qdd = [None] * (J - 1)
    for j in range(1, J):
        p = parents[j]
        a_p = sp.xform_motion(E[j], p_off[j], a[p]) + c[j]
        qdd_j = jnp.einsum("...ij,...j->...i", Dinv[j],
                           u[j] - jnp.einsum("...ij,...j->...i",
                                             jnp.swapaxes(U[j], -1, -2), a_p))
        a[j] = a_p + jnp.concatenate([qdd_j, jnp.zeros((N, 3))], axis=-1)
        qdd[j - 1] = qdd_j

    return a[0], jnp.stack(qdd, axis=1)


# ---------------------------------------------------------------------------
# integration
# ---------------------------------------------------------------------------

def integrate(state: ArticulationState, a_root, qdd, dt: float) -> ArticulationState:
    """Semi-implicit Euler in generalized coordinates with quaternion joints."""
    root_vel = state.root_vel + dt * a_root
    joint_omega = state.joint_omega + dt * qdd

    # root pose: velocities are in (old) root body coords
    w_b = root_vel[..., :3]
    v_b = root_vel[..., 3:]
    root_pos = state.root_pos + dt * Q.quat_rotate(state.root_quat, v_b)
    dq = Q.exp_map_to_quat(w_b * dt)
    root_quat = Q.quat_mul_norm(state.root_quat, dq)

    dqj = Q.exp_map_to_quat(joint_omega * dt)
    joint_quat = Q.quat_mul_norm(state.joint_quat, dqj)

    return ArticulationState(root_pos, root_quat, root_vel, joint_quat, joint_omega)


# ---------------------------------------------------------------------------
# full substep / control step
# ---------------------------------------------------------------------------

def substep(model: ArticulationModel, state: ArticulationState, pd_targets,
            root_force_w=None, root_torque_w=None,
            contact_params: ContactParams = ContactParams(), dt: float = 1.0 / 240.0,
            extra_force_w=None, extra_torque_w=None, fixed_base: bool = False):
    """One physics substep. root_*_w: residual world forces on the pelvis
    (`humanoid_smpl_im.py:141-154`); extra_*_w (N,J,3): arbitrary per-body wrenches
    (e.g. ball-racket coupling)."""
    body_pos, body_quat, body_lin, body_ang = fk_world(model, state)
    f_w, t_w, _ = ground_contacts(model, body_pos, body_quat, body_lin, body_ang,
                                  contact_params)
    if root_force_w is not None:
        f_w = f_w.at[:, 0].add(root_force_w)
    if root_torque_w is not None:
        t_w = t_w.at[:, 0].add(root_torque_w)
    if extra_force_w is not None:
        f_w = f_w + extra_force_w
    if extra_torque_w is not None:
        t_w = t_w + extra_torque_w

    tau = pd_torques(model, state, pd_targets, dt)
    a_root, qdd = aba(model, state, tau, f_w, t_w, body_quat, dt, fixed_base)
    return integrate(state, a_root, qdd, dt)


def control_step(model: ArticulationModel, state: ArticulationState, pd_targets,
                 root_force_w=None, root_torque_w=None, substeps: int = 4,
                 control_dt: float = 1.0 / 30.0,
                 contact_params: ContactParams = ContactParams()):
    """One control step = `substeps` physics substeps at control_dt/substeps.

    Mirrors `BaseTask.step`'s pre→simulate×control_freq_inv→post skeleton
    (`base_task.py:147-165`) with the inner loop fully fused under jit.
    """
    dt = control_dt / substeps
    for _ in range(substeps):
        state = substep(model, state, pd_targets, root_force_w, root_torque_w,
                        contact_params, dt)
    return state


# ---------------------------------------------------------------------------
# observation helpers: generalized state → Isaac-style tensors
# ---------------------------------------------------------------------------

def dof_pos(state: ArticulationState):
    """(N, (J-1)*3) exp-map joint coordinates (matches MotionLib
    `_local_rotation_to_dof`, `motion_lib.py:460-488`)."""
    em = Q.quat_to_exp_map(state.joint_quat)
    return em.reshape(em.shape[0], -1)


def dof_vel(state: ArticulationState):
    return state.joint_omega.reshape(state.joint_omega.shape[0], -1)


def rigid_body_state(model: ArticulationModel, state: ArticulationState):
    """World body states: (pos (N,J,3), quat (N,J,4), lin vel (N,J,3), ang vel (N,J,3))."""
    return fk_world(model, state)


def set_state_from_reference(model: ArticulationModel, root_pos, root_rot,
                             root_vel_w, root_ang_vel_w, dof_pos_flat, dof_vel_flat):
    """Build an ArticulationState from Isaac-style reset quantities
    (`humanoid_smpl_im.py:741-755`): world root pose/velocities + exp-map dofs."""
    N = root_pos.shape[0]
    J = model.num_bodies
    w_b = Q.quat_rotate_inverse(root_rot, root_ang_vel_w)
    v_b = Q.quat_rotate_inverse(root_rot, root_vel_w)
    joint_quat = Q.exp_map_to_quat(dof_pos_flat.reshape(N, J - 1, 3))
    return ArticulationState(
        root_pos=root_pos,
        root_quat=root_rot,
        root_vel=jnp.concatenate([w_b, v_b], axis=-1),
        joint_quat=joint_quat,
        joint_omega=dof_vel_flat.reshape(N, J - 1, 3),
    )
