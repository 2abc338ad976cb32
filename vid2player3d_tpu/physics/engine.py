"""Jit-compiled batched articulated rigid-body dynamics (Featherstone ABA).

This is the TPU-native replacement for Isaac Gym/PhysX `gym.simulate`
(`base_task.py:450-454`): a pure function
    substep(model, state, joint_torque, root_force, ext_forces, dt) -> state
batched over envs and vectorized over the (static, ≤26-body) kinematic tree.

Layout: ALL inner math runs on the structure-of-arrays core (`physics/soa.py`)
over **level-batched slabs** — every vector/matrix component is a (J, N) (or
(L, N)) array with the env axis minor, so each operation is a pure elementwise
VPU op at full lane utilization, and bodies at the same tree depth are
processed together (8 levels instead of 23 bodies for SMPL-24). The previous
(N,3,3)/(N,6,6) array-of-structures layout put the tiny matrix dims in the
TPU's (8,128) vector tiles (~2% lane utilization) and lowered 6x6 batched
matmuls to MXU-hostile dot_generals; this rewrite is ~60x faster at 4096 envs
(27.4ms → sub-ms per control step, see bench.py) and keeps HLO op count low
enough for fast CPU test compiles.

Pipeline per substep:
  1. FK → body world poses/velocities (per-level chain)
  2. penalty ground contacts → dense per-body external wrench slabs
  3. PD joint torques in one slab op (exp-map target difference, matching the
     reference's `pd_torque = (pd_tar - dof_pos) * stiffness`,
     `humanoid_smpl_im.py:135`)
  4. ABA forward dynamics (3x3 block-expanded articulated inertias
     [[A, B], [Bᵀ, D]] with A/D symmetric, never a dense 6x6; per-level
     elimination with duplicate-parent scatter-adds)
  5. semi-implicit Euler integrate (quaternion joints, body-frame twists)

`control_step` hoists the model unpack + per-body spatial inertias out of a
`lax.scan` over substeps, so per-substep work is state-dependent math only.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import quat as Q
from . import soa
from .model import ArticulationModel, ArticulationState, ContactParams, GRAVITY

_GZ = float(GRAVITY[2])


# ---------------------------------------------------------------------------
# slab helpers: tuples of (J, N) component arrays; body axis leading, env
# axis minor (lanes)
# ---------------------------------------------------------------------------

def _tJ(a):
    """(N, J) -> (J, N)."""
    return jnp.swapaxes(a, 0, 1)


def _slab(a):
    """(N, J, K) -> K-tuple of (J, N)."""
    return tuple(jnp.swapaxes(a[..., i], 0, 1) for i in range(a.shape[-1]))


def _slab_m33(a):
    """(N, J, 3, 3) -> m33 tuple-of-tuples of (J, N)."""
    return tuple(tuple(jnp.swapaxes(a[..., r, c], 0, 1) for c in range(3))
                 for r in range(3))


def _g(t, idx):
    """Gather rows: K-tuple of (J, N) -> K-tuple of (L, N)."""
    return tuple(a[idx] for a in t)


def _g_m33(m, idx):
    return tuple(tuple(a[idx] for a in row) for row in m)


def _sset(t, idx, vals):
    return tuple(a.at[idx].set(v) for a, v in zip(t, vals))


def _sadd(t, idx, vals):
    return tuple(a.at[idx].add(v) for a, v in zip(t, vals))


def _sadd_m33(m, idx, vals):
    return tuple(tuple(m[r][c].at[idx].add(vals[r][c]) for c in range(3))
                 for r in range(3))


def _sset_m33(m, idx, vals):
    return tuple(tuple(m[r][c].at[idx].set(vals[r][c]) for c in range(3))
                 for r in range(3))


def _zeros_slab(J, N, k, dtype=jnp.float32):
    z = jnp.zeros((J, N), dtype)
    return tuple(z for _ in range(k))


def _zeros_m33(J, N, dtype=jnp.float32):
    z = jnp.zeros((J, N), dtype)
    return ((z, z, z), (z, z, z), (z, z, z))


def _levels(parents: Tuple[int, ...]) -> List[np.ndarray]:
    """Bodies grouped by tree depth: levels[0] == [root]; every body's parent
    lives exactly one level up."""
    depth = [0] * len(parents)
    for j in range(1, len(parents)):
        depth[j] = depth[parents[j]] + 1
    out = []
    for d in range(max(depth) + 1):
        out.append(np.array([j for j, dj in enumerate(depth) if dj == d],
                            dtype=np.int32))
    return out


# ---------------------------------------------------------------------------
# model/state pack-unpack at the module boundary
# ---------------------------------------------------------------------------

def _model_soa(model: ArticulationModel) -> Dict:
    """Unpack model arrays into component slabs (loop-invariant — call once
    per control step, outside the substep scan).

    Level plumbing (static, numpy): `levels[d]` = body ids at tree depth d;
    `par_loc[d]` = position of each level-d body's parent WITHIN level d-1's
    id list, so parent lookups are gathers from a small (L, N) slab and the
    only scatters left are the per-level parent accumulations of ABA pass 2.
    `body_order`/`inv_order` convert between level-major packing and body
    order."""
    parents = np.asarray(model.parents)
    levels = _levels(model.parents)
    pos_in_level = {}
    for ids in levels:
        for k, j in enumerate(ids):
            pos_in_level[j] = k
    par_loc = [None] + [np.array([pos_in_level[parents[j]] for j in ids],
                                 dtype=np.int32) for ids in levels[1:]]
    body_order = np.concatenate(levels)              # level-major -> body id
    inv_order = np.argsort(body_order).astype(np.int32)  # body id -> packed row
    inv_joint_order = np.argsort(body_order[1:]).astype(np.int32)

    msoa = dict(
        parents=model.parents,
        levels=levels,
        par_loc=par_loc,
        inv_order=inv_order,
        inv_joint_order=inv_joint_order,
        joint_pos=_slab(model.joint_pos),        # v3 slab (J, N)
        body_com=_slab(model.body_com),
        body_mass=_tJ(model.body_mass),          # (J, N)
        kp=_tJ(model.kp),                        # (J-1, N)
        kd=_tJ(model.kd),
        torque_lim=_tJ(model.torque_lim),
        armature=_tJ(model.armature),
        contact_body=np.asarray(model.contact_body, dtype=np.int32),
        contact_offset=_slab(model.contact_offset),   # v3 slab (P, N)
        contact_radius=_tJ(model.contact_radius),     # (P, N)
        pair_i=np.asarray([p[0] for p in model.collision_pairs], np.int32),
        pair_j=np.asarray([p[1] for p in model.collision_pairs], np.int32),
    )
    # spatial inertia blocks about body origin, body frame (state-independent)
    msoa["I_sp"] = soa.sp_inertia(msoa["body_mass"], msoa["body_com"],
                                  _slab_m33(model.body_inertia))
    return msoa


def _state_soa(state: ArticulationState) -> Dict:
    return dict(
        root_pos=soa.unpack(state.root_pos),
        root_quat=soa.unpack(state.root_quat),
        root_w=soa.unpack(state.root_vel[:, :3]),
        root_v=soa.unpack(state.root_vel[:, 3:]),
        jq=_slab(state.joint_quat),      # q4 slab (J-1, N)
        jo=_slab(state.joint_omega),     # v3 slab (J-1, N)
    )


def _state_aos(s: Dict) -> ArticulationState:
    return ArticulationState(
        root_pos=soa.pack(s["root_pos"]),
        root_quat=soa.pack(s["root_quat"]),
        root_vel=jnp.concatenate([soa.pack(s["root_w"]),
                                  soa.pack(s["root_v"])], axis=-1),
        joint_quat=jnp.stack([jnp.swapaxes(c, 0, 1) for c in s["jq"]], axis=-1),
        joint_omega=jnp.stack([jnp.swapaxes(c, 0, 1) for c in s["jo"]], axis=-1),
    )


# ---------------------------------------------------------------------------
# forward kinematics (per-level chain on slabs)
# ---------------------------------------------------------------------------

def _row(t):
    """K-tuple of (N,) -> K-tuple of (1, N) level-zero slabs."""
    return tuple(a[None] for a in t)


def _pack_levels(lvls, order):
    """List over levels of K-tuples of (L, N) -> K-tuple of (J', N) rows
    permuted by static `order` (level-major concat → body order)."""
    K = len(lvls[0])
    return tuple(
        jnp.concatenate([lv[k] for lv in lvls], axis=0)[order]
        for k in range(K))


def _fk_levels(msoa: Dict, s: Dict):
    """Per-level world body lists: (pos, quat, lin, ang), each a list over
    levels of v3/q4 tuples of (L, N). No scatters — parent lookups are
    gathers from the previous level's small slab."""
    pos = [_row(s["root_pos"])]
    quat = [_row(s["root_quat"])]
    ang = [_row(soa.q_rotate(s["root_quat"], s["root_w"]))]
    lin = [_row(soa.q_rotate(s["root_quat"], s["root_v"]))]

    for d, ids in enumerate(msoa["levels"][1:], start=1):
        pl = msoa["par_loc"][d]
        qp = _g(quat[d - 1], pl)
        off_w = soa.q_rotate(qp, _g(msoa["joint_pos"], ids))
        q_l = soa.q_mul_norm(qp, _g(s["jq"], ids - 1))
        ang_p = _g(ang[d - 1], pl)
        pos.append(soa.v_add(_g(pos[d - 1], pl), off_w))
        quat.append(q_l)
        ang.append(soa.v_add(ang_p, soa.q_rotate(q_l, _g(s["jo"], ids - 1))))
        lin.append(soa.v_add(_g(lin[d - 1], pl), soa.v_cross(ang_p, off_w)))
    return pos, quat, lin, ang


def _fk_soa(msoa: Dict, s: Dict):
    """World body slabs: (pos v3, quat q4, lin v3, ang v3), each (J, N) in
    body order."""
    pos, quat, lin, ang = _fk_levels(msoa, s)
    io = msoa["inv_order"]
    return (_pack_levels(pos, io), _pack_levels(quat, io),
            _pack_levels(lin, io), _pack_levels(ang, io))


def fk_world(model: ArticulationModel, state: ArticulationState):
    """Returns body_pos (N,J,3), body_quat (N,J,4), body_vel_w (N,J,3),
    body_ang_vel_w (N,J,3) — AoS wrapper over the slab chain."""
    msoa = _model_soa(model)
    s = _state_soa(state)
    pos, quat, lin, ang = _fk_soa(msoa, s)

    def pk(t):
        return jnp.stack([jnp.swapaxes(c, 0, 1) for c in t], axis=-1)

    return pk(pos), pk(quat), pk(lin), pk(ang)


# ---------------------------------------------------------------------------
# contacts: penalty sphere-vs-ground → dense wrench slabs
# ---------------------------------------------------------------------------

def _contacts_soa(msoa: Dict, pos, quat, lin, ang, params: ContactParams,
                  f_w, t_w):
    """Accumulate ground-plane penalty contact wrenches into the dense world
    wrench slabs (f_w, t_w) (`humanoid_smpl.py:735-743`), plus sphere-sphere
    self-collision over the model's static pair list."""
    cb = msoa["contact_body"]
    off_w = soa.q_rotate(_g(quat, cb), msoa["contact_offset"])
    c_w = soa.v_add(_g(pos, cb), off_w)
    v_c = soa.v_add(_g(lin, cb), soa.v_cross(_g(ang, cb), off_w))

    pen = jnp.maximum(msoa["contact_radius"] - c_w[2], 0.0)
    active = pen > 0.0
    fn = params.kn * pen - params.dn * v_c[2] * active
    fn = jnp.maximum(fn, 0.0) * active

    vt_norm = jnp.sqrt(v_c[0] * v_c[0] + v_c[1] * v_c[1])
    ft_mag = jnp.minimum(params.mu * fn, params.kt * vt_norm)
    sc = -ft_mag / jnp.maximum(vt_norm, params.vt_eps)
    f_c = (v_c[0] * sc, v_c[1] * sc, fn)
    t_c = soa.v_cross(off_w, f_c)
    f_w, t_w = _sadd(f_w, cb, f_c), _sadd(t_w, cb, t_c)

    if len(msoa["pair_i"]):
        f_w, t_w = _self_contacts_soa(msoa, cb, off_w, c_w, v_c, params,
                                      f_w, t_w)
    return f_w, t_w


def _self_contacts_soa(msoa: Dict, cb, off_w, c_w, v_c,
                       params: ContactParams, f_w, t_w):
    """Sphere-sphere penalty contacts over the static curated pair list —
    the TPU analogue of the reference's PhysX self-collision filter masks
    (`humanoid_smpl_im_mvae.py:388-417`): arms deflect off the trunk instead
    of passing through. Pure (K, N) slab math; K ~ 55 pairs, negligible next
    to ABA."""
    pi, pj = msoa["pair_i"], msoa["pair_j"]
    d = soa.v_sub(_g(c_w, pi), _g(c_w, pj))
    dist = jnp.sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2])
    n = tuple(c / jnp.maximum(dist, 1e-6) for c in d)
    pen = (msoa["contact_radius"][pi] + msoa["contact_radius"][pj]) - dist
    active = pen > 0.0
    dv = soa.v_sub(_g(v_c, pi), _g(v_c, pj))
    vn = dv[0] * n[0] + dv[1] * n[1] + dv[2] * n[2]
    # softer than the ground plane: body "flesh" compresses; damping keeps
    # the stiff PD arms from chattering against the trunk
    fn = jnp.maximum(0.5 * params.kn * pen - params.dn * vn, 0.0) * active
    f = tuple(fn * c for c in n)
    f_neg = soa.v_neg(f)
    bi, bj = cb[pi], cb[pj]
    f_w = _sadd(_sadd(f_w, bi, f), bj, f_neg)
    t_w = _sadd(_sadd(t_w, bi, soa.v_cross(_g(off_w, pi), f)),
                bj, soa.v_cross(_g(off_w, pj), f_neg))
    return f_w, t_w


# ---------------------------------------------------------------------------
# PD control (single slab op over all joints)
# ---------------------------------------------------------------------------

def _pd_torques_soa(msoa: Dict, s: Dict, pd_tar, dt: float):
    """Stable-PD proportional torque in exp-map coords (Tan et al. 2011):
        τ_p = kp · (q_tar − (q + dt·ω))
    The damping term is handled IMPLICITLY inside ABA (D += (armature+dt·kd)I,
    u −= kd·ω), keeping the reference's stiff gains stable at large timesteps
    — PhysX integrates its joint drives implicitly too."""
    cur = soa.q_to_exp_map(s["jq"])
    kp, lim = msoa["kp"], msoa["torque_lim"]
    return tuple(
        jnp.clip(kp * (pd_tar[k] - cur[k] - dt * s["jo"][k]), -lim, lim)
        for k in range(3))


# ---------------------------------------------------------------------------
# ABA forward dynamics (block 3x3 form, per-level elimination)
# ---------------------------------------------------------------------------

def _aba_soa(msoa: Dict, s: Dict, tau, quat_w, f_ext_w, t_ext_w,
             dt: float, fixed_base: bool):
    """Articulated Body Algorithm over the static tree.

    tau: v3 slab (J-1, N) joint torques in child coords (stable-PD
    proportional part); f_ext_w/t_ext_w: dense v3 slabs (J, N) of world
    wrenches at body origins (contacts, residual root forces — gravity is
    added here). Joint damping kd is applied implicitly:
    D += (armature + dt·kd)·I₃ and u −= kd·ω.

    Returns (a_root (ω̇ v3, v̇ v3) in root coords, qdd v3 slab (J-1, N)).
    """
    levels = msoa["levels"]
    par_loc = msoa["par_loc"]
    D_lv = len(levels)

    # --- joint transforms + velocities (pass 1, per level)
    E = [None] * D_lv          # parent→child rotation per level (m33 of (L,N))
    v_lv = [(_row(s["root_w"]), _row(s["root_v"]))]
    c_lv = [None]              # root has no velocity-product accel
    for d, ids in enumerate(levels[1:], start=1):
        E_l = soa.m_T(soa.q_to_m33(_g(s["jq"], ids - 1)))
        vJ = _g(s["jo"], ids - 1)
        vp = (_g(v_lv[d - 1][0], par_loc[d]), _g(v_lv[d - 1][1], par_loc[d]))
        w_p, v_p = soa.sp_xform_motion(E_l, _g(msoa["joint_pos"], ids), vp)
        w_l = soa.v_add(w_p, vJ)
        E[d] = E_l
        v_lv.append((w_l, v_p))
        c_lv.append(soa.sp_cross_motion((w_l, v_p),
                                        (vJ, soa.v_zeros(vJ[0]))))

    # --- bias forces, whole-tree slab op (body order):
    # pA = v ×* (I v) − f_ext (body frame, gravity included)
    io = msoa["inv_order"]
    v_w = _pack_levels([lv[0] for lv in v_lv], io)
    v_v = _pack_levels([lv[1] for lv in v_lv], io)
    I_A, I_B, I_D = msoa["I_sp"]
    Iv = (soa.v_add(soa.m_vec(I_A, v_w), soa.m_vec(I_B, v_v)),
          soa.v_add(soa.mT_vec(I_B, v_w), soa.m_vec(I_D, v_v)))
    bias_n, bias_f = soa.sp_cross_force((v_w, v_v), Iv)

    fg_z = msoa["body_mass"] * _GZ
    com_w = soa.q_rotate(quat_w, msoa["body_com"])
    t_tot = (t_ext_w[0] + com_w[1] * fg_z, t_ext_w[1] - com_w[0] * fg_z,
             t_ext_w[2])
    f_tot = (f_ext_w[0], f_ext_w[1], f_ext_w[2] + fg_z)
    n_ext = soa.q_rotate_inv(quat_w, t_tot)
    f_ext = soa.q_rotate_inv(quat_w, f_tot)
    pA_n_all = soa.v_sub(bias_n, n_ext)
    pA_f_all = soa.v_sub(bias_f, f_ext)

    # --- pass 2: backward, eliminate joints per level (S = [I₃; 0]).
    # Accumulators per level carry the children's contributions; the ONLY
    # scatter is the (L_{d-1}, N)-sized parent add, which also handles
    # several same-level children of one parent.
    accIA = [None] * D_lv      # (A, B, D) m33 tuples or None
    acc_p = [None] * D_lv      # (n, f) v3 tuples or None
    Dinv = [None] * D_lv
    UA = [None] * D_lv
    UB = [None] * D_lv
    u = [None] * D_lv
    for d in range(D_lv - 1, 0, -1):
        ids = levels[d]
        jm1 = ids - 1
        A = _g_m33(I_A, ids)
        B = _g_m33(I_B, ids)
        D = _g_m33(I_D, ids)
        pn = _g(pA_n_all, ids)
        pf = _g(pA_f_all, ids)
        if accIA[d] is not None:
            A = soa.m_add(A, accIA[d][0])
            B = soa.m_add(B, accIA[d][1])
            D = soa.m_add(D, accIA[d][2])
            pn = soa.v_add(pn, acc_p[d][0])
            pf = soa.v_add(pf, acc_p[d][1])

        d_diag = msoa["armature"][jm1] + dt * msoa["kd"][jm1]
        Dj = tuple(tuple(A[r][c] + d_diag if r == c else A[r][c]
                         for c in range(3)) for r in range(3))
        Dinv_l = soa.m_inv(Dj)
        kd = msoa["kd"][jm1]
        jo_l = _g(s["jo"], jm1)
        u_l = tuple(_g(tau, jm1)[k] - kd * jo_l[k] - pn[k] for k in range(3))

        # Ia = IA − U Dinv Uᵀ (blocks, A/D symmetric)
        ADi = soa.m_mul(A, Dinv_l)
        Ia_A = soa.m_sub(A, soa.m_mulT(ADi, A))
        Ia_B = soa.m_sub(B, soa.m_mul(ADi, B))
        BTDi = soa.mT_mul(B, Dinv_l)
        Ia_D = soa.m_sub(D, soa.m_mul(BTDi, B))

        # pa = pA + Ia c + U Dinv u
        cw_l, cv_l = c_lv[d]
        Di_u = soa.m_vec(Dinv_l, u_l)
        pa_n = soa.v_add(soa.v_add(pn, soa.m_vec(Ia_A, cw_l)),
                         soa.v_add(soa.m_vec(Ia_B, cv_l), soa.m_vec(A, Di_u)))
        pa_f = soa.v_add(soa.v_add(pf, soa.mT_vec(Ia_B, cw_l)),
                         soa.v_add(soa.m_vec(Ia_D, cv_l),
                                   soa.mT_vec(B, Di_u)))

        p_l = _g(msoa["joint_pos"], ids)
        Ap, Bp, Dp = soa.sp_xform_inertia_to_parent(E[d], p_l,
                                                    Ia_A, Ia_B, Ia_D)
        n_p, f_p = soa.sp_xform_force_to_parent(E[d], p_l, (pa_n, pa_f))

        Dinv[d], UA[d], UB[d], u[d] = Dinv_l, A, B, u_l

        Lp = len(levels[d - 1])
        N = pa_n[0].shape[-1]
        pl = par_loc[d]
        if accIA[d - 1] is None:
            zm = _zeros_m33(Lp, N)
            accIA[d - 1] = (zm, _zeros_m33(Lp, N), _zeros_m33(Lp, N))
            zv = _zeros_slab(Lp, N, 3)
            acc_p[d - 1] = (zv, _zeros_slab(Lp, N, 3))
        aA, aB, aD = accIA[d - 1]
        accIA[d - 1] = (_sadd_m33(aA, pl, Ap), _sadd_m33(aB, pl, Bp),
                        _sadd_m33(aD, pl, Dp))
        an, af = acc_p[d - 1]
        acc_p[d - 1] = (_sadd(an, pl, n_p), _sadd(af, pl, f_p))

    # --- base acceleration
    if fixed_base:
        z = soa.v_zeros(s["root_w"][0])
        a0 = (z, z)
    else:
        def row0_m(m, add):
            return tuple(tuple(m[r][c][0] + add[r][c][0] for c in range(3))
                         for r in range(3))

        zero_m = _zeros_m33(1, 1)
        aA, aB, aD = accIA[0] if accIA[0] is not None else (zero_m,) * 3
        A0 = row0_m(_g_m33(I_A, levels[0]), aA)
        B0 = row0_m(_g_m33(I_B, levels[0]), aB)
        D0 = row0_m(_g_m33(I_D, levels[0]), aD)
        pn0 = tuple(_g(pA_n_all, levels[0])[k][0] + acc_p[0][0][k][0]
                    for k in range(3)) if acc_p[0] is not None else \
            tuple(_g(pA_n_all, levels[0])[k][0] for k in range(3))
        pf0 = tuple(_g(pA_f_all, levels[0])[k][0] + acc_p[0][1][k][0]
                    for k in range(3)) if acc_p[0] is not None else \
            tuple(_g(pA_f_all, levels[0])[k][0] for k in range(3))
        a0 = soa.sp_solve_sym66(A0, B0, D0, soa.v_neg(pn0), soa.v_neg(pf0))

    # --- pass 3: forward, joint accelerations per level
    a_lv = [(_row(a0[0]), _row(a0[1]))]
    qdd_lv = []
    for d, ids in enumerate(levels[1:], start=1):
        pl = par_loc[d]
        ap = (_g(a_lv[d - 1][0], pl), _g(a_lv[d - 1][1], pl))
        aw_p, av_p = soa.sp_xform_motion(E[d], _g(msoa["joint_pos"], ids), ap)
        a_pw = soa.v_add(aw_p, c_lv[d][0])
        a_pv = soa.v_add(av_p, c_lv[d][1])
        # qdd = Dinv (u − Uᵀ a) with Uᵀ a = A a_ω + B a_v
        rhs = soa.v_sub(u[d], soa.v_add(soa.m_vec(UA[d], a_pw),
                                        soa.m_vec(UB[d], a_pv)))
        qdd_l = soa.m_vec(Dinv[d], rhs)
        qdd_lv.append(qdd_l)
        a_lv.append((soa.v_add(a_pw, qdd_l), a_pv))

    qdd = _pack_levels(qdd_lv, msoa["inv_joint_order"])
    return a0, qdd


# ---------------------------------------------------------------------------
# integration (single slab op)
# ---------------------------------------------------------------------------

def _integrate_soa(s: Dict, a0, qdd, dt: float) -> Dict:
    """Semi-implicit Euler in generalized coordinates, quaternion joints."""
    root_w = soa.v_add(s["root_w"], soa.v_scale(a0[0], dt))
    root_v = soa.v_add(s["root_v"], soa.v_scale(a0[1], dt))
    root_pos = soa.v_add(s["root_pos"],
                         soa.v_scale(soa.q_rotate(s["root_quat"], root_v), dt))
    dq = soa.exp_map_to_q(soa.v_scale(root_w, dt))
    root_quat = soa.q_mul_norm(s["root_quat"], dq)

    jo = soa.v_add(s["jo"], soa.v_scale(qdd, dt))
    dqj = soa.exp_map_to_q(soa.v_scale(jo, dt))
    jq = soa.q_mul_norm(s["jq"], dqj)
    return dict(root_pos=root_pos, root_quat=root_quat, root_w=root_w,
                root_v=root_v, jq=jq, jo=jo)


# ---------------------------------------------------------------------------
# full substep / control step
# ---------------------------------------------------------------------------

def _substep_soa(msoa: Dict, s: Dict, pd_tar,
                 root_force, root_torque, extra_f, extra_t,
                 contact_params: ContactParams, dt: float,
                 fixed_base: bool) -> Dict:
    """One physics substep on slabs. root_force/torque: v3 world wrenches on
    the pelvis (`humanoid_smpl_im.py:141-154`) or None; extra_f/extra_t:
    dense v3 slabs (J, N) of world wrenches (e.g. ball-racket coupling)."""
    pos, quat, lin, ang = _fk_soa(msoa, s)

    J = len(msoa["parents"])
    N = s["root_pos"][0].shape[0]
    f_w = extra_f if extra_f is not None else _zeros_slab(J, N, 3)
    t_w = extra_t if extra_t is not None else _zeros_slab(J, N, 3)
    f_w, t_w = _contacts_soa(msoa, pos, quat, lin, ang, contact_params,
                             f_w, t_w)
    if root_force is not None:
        f_w = _sadd(f_w, 0, root_force)
    if root_torque is not None:
        t_w = _sadd(t_w, 0, root_torque)

    tau = _pd_torques_soa(msoa, s, pd_tar, dt)
    a0, qdd = _aba_soa(msoa, s, tau, quat, f_w, t_w, dt, fixed_base)
    return _integrate_soa(s, a0, qdd, dt)


def substep(model: ArticulationModel, state: ArticulationState, pd_targets,
            root_force_w=None, root_torque_w=None,
            contact_params: ContactParams = ContactParams(), dt: float = 1.0 / 240.0,
            extra_force_w=None, extra_torque_w=None, fixed_base: bool = False):
    """One physics substep (AoS wrapper). extra_*_w (N,J,3): arbitrary
    per-body world wrenches (e.g. ball-racket coupling)."""
    msoa = _model_soa(model)
    s = _state_soa(state)
    J = model.num_bodies
    N = state.root_pos.shape[0]
    pd_tar = _slab(pd_targets.reshape(N, J - 1, 3))
    rf = soa.unpack(root_force_w) if root_force_w is not None else None
    rt = soa.unpack(root_torque_w) if root_torque_w is not None else None
    ef = _slab(extra_force_w) if extra_force_w is not None else None
    et = _slab(extra_torque_w) if extra_torque_w is not None else None
    s = _substep_soa(msoa, s, pd_tar, rf, rt, ef, et, contact_params, dt,
                     fixed_base)
    return _state_aos(s)


def control_step(model: ArticulationModel, state: ArticulationState, pd_targets,
                 root_force_w=None, root_torque_w=None, substeps: int = 4,
                 control_dt: float = 1.0 / 30.0,
                 contact_params: ContactParams = ContactParams(),
                 extra_force_w=None, extra_torque_w=None):
    """One control step = `substeps` physics substeps at control_dt/substeps.

    Mirrors `BaseTask.step`'s pre→simulate×control_freq_inv→post skeleton
    (`base_task.py:147-165`), fused under jit: the model unpack and spatial
    inertias are hoisted out of a `lax.scan` over identical substeps.
    extra_force_w/extra_torque_w (N, J, 3): per-body world wrenches held
    constant over the control step (e.g. ball-racket reaction coupling).
    """
    dt = control_dt / substeps
    msoa = _model_soa(model)
    N = state.root_pos.shape[0]
    pd_tar = _slab(pd_targets.reshape(N, model.num_bodies - 1, 3))
    rf = soa.unpack(root_force_w) if root_force_w is not None else None
    rt = soa.unpack(root_torque_w) if root_torque_w is not None else None
    ef = _slab(extra_force_w) if extra_force_w is not None else None
    et = _slab(extra_torque_w) if extra_torque_w is not None else None

    def body(s, _):
        s = _substep_soa(msoa, s, pd_tar, rf, rt, ef, et, contact_params,
                         dt, False)
        return s, None

    s, _ = jax.lax.scan(body, _state_soa(state), None, length=substeps)
    return _state_aos(s)


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
