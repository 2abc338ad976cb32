"""Quaternion algebra in xyzw convention (pure JAX).

Semantics match the reference's jit-scripted torch ops
(`/root/reference/embodied_pose/utils/torch_utils.py:13-244` plus the isaacgym
`torch_utils` primitives they build on), re-implemented TPU-first: every function is a
pure jnp op over arbitrary leading batch dims, safe under jit/vmap/grad (no data-dependent
branches; singularities handled with `where` masks).

Convention: q = [x, y, z, w]; rotations are active; unit quaternions assumed unless noted.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_EPS = 1e-9


def normalize_angle(a):
    """Wrap angle(s) to (-pi, pi]."""
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))


# ---------------------------------------------------------------------------
# construction / normalization
# ---------------------------------------------------------------------------

def quat_identity(shape=()):
    q = jnp.zeros(tuple(shape) + (4,))
    return q.at[..., 3].set(1.0)


def quat_from_angle_axis(angle, axis):
    """Quaternion from rotation `angle` about (unit or non-unit) `axis`."""
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), _EPS)
    half = 0.5 * angle[..., None]
    return jnp.concatenate([axis * jnp.sin(half), jnp.cos(half)], axis=-1)


def quat_from_euler_xyz(roll, pitch, yaw):
    """Intrinsic XYZ euler → quat (matches isaacgym `quat_from_euler_xyz`)."""
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    qw = cy * cp * cr + sy * sp * sr
    qx = cy * cp * sr - sy * sp * cr
    qy = cy * sp * cr + sy * cp * sr
    qz = sy * cp * cr - cy * sp * sr
    return jnp.stack([qx, qy, qz, qw], axis=-1)


def quat_pos(q):
    """Flip sign so the real (w) part is non-negative."""
    return jnp.where(q[..., 3:] < 0, -q, q)


def quat_abs(q):
    return jnp.linalg.norm(q, axis=-1)


def quat_unit(q):
    return q / jnp.maximum(quat_abs(q)[..., None], _EPS)


def quat_normalize(q):
    return quat_unit(quat_pos(q))


# ---------------------------------------------------------------------------
# algebra
# ---------------------------------------------------------------------------

def quat_mul(a, b):
    """Hamilton product a*b, xyzw."""
    x1, y1, z1, w1 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    x2, y2, z2, w2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    w = w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2
    x = w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2
    y = w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2
    z = w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2
    return jnp.stack([x, y, z, w], axis=-1)


def quat_mul_norm(a, b):
    return quat_normalize(quat_mul(a, b))


def quat_conjugate(q):
    return jnp.concatenate([-q[..., :3], q[..., 3:]], axis=-1)


quat_inverse = quat_conjugate  # unit quaternions


def quat_rotate(q, v):
    """Rotate vector(s) v by quaternion(s) q (reference `my_quat_rotate`)."""
    q_w = q[..., 3:]
    q_vec = q[..., :3]
    a = v * (2.0 * q_w**2 - 1.0)
    b = jnp.cross(q_vec, v) * q_w * 2.0
    c = q_vec * jnp.sum(q_vec * v, axis=-1, keepdims=True) * 2.0
    return a + b + c


def quat_rotate_inverse(q, v):
    return quat_rotate(quat_conjugate(q), v)


# ---------------------------------------------------------------------------
# conversions
# ---------------------------------------------------------------------------

def quat_to_angle_axis(q):
    """Return (angle, axis); angle wrapped to (-pi, pi], axis defaults to +z
    near identity.

    Formulated with atan2(|xyz|, w) instead of arccos(w): identical for unit
    quaternions, but with finite gradients at identity (arccos' gradient is
    ±inf at w = ±1, which poisons the where-masked branch with 0·inf = NaN
    when differentiating through the context-IK chain)."""
    min_theta = 1e-5
    w = jnp.clip(q[..., 3], -1.0, 1.0)
    s2 = jnp.sum(q[..., :3] * q[..., :3], axis=-1)
    sin_theta = jnp.sqrt(jnp.maximum(s2, 1e-18))  # == sqrt(1-w²) for unit q
    angle = normalize_angle(2 * jnp.arctan2(sin_theta, w))
    axis = q[..., :3] / jnp.maximum(sin_theta[..., None], _EPS)
    default_axis = jnp.zeros_like(axis).at[..., 2].set(1.0)
    mask = jnp.abs(sin_theta) > min_theta
    angle = jnp.where(mask, angle, 0.0)
    axis = jnp.where(mask[..., None], axis, default_axis)
    return angle, axis


def angle_axis_to_exp_map(angle, axis):
    return angle[..., None] * axis


def quat_to_exp_map(q):
    angle, axis = quat_to_angle_axis(q)
    return angle_axis_to_exp_map(angle, axis)


def exp_map_to_angle_axis(exp_map):
    min_theta = 1e-5
    # safe norm: `jnp.linalg.norm`'s gradient is NaN at exactly 0 (identity)
    angle = jnp.sqrt(jnp.maximum(
        jnp.sum(exp_map * exp_map, axis=-1), 1e-18))
    axis = exp_map / jnp.maximum(angle[..., None], _EPS)
    angle = normalize_angle(angle)
    default_axis = jnp.zeros_like(exp_map).at[..., 2].set(1.0)
    mask = jnp.abs(angle) > min_theta
    angle = jnp.where(mask, angle, 0.0)
    axis = jnp.where(mask[..., None], axis, default_axis)
    return angle, axis


def exp_map_to_quat(exp_map):
    angle, axis = exp_map_to_angle_axis(exp_map)
    return quat_from_angle_axis(angle, axis)


def quat_to_tan_norm(q):
    """6D tangent+normal representation: rotated x-axis ++ rotated z-axis."""
    ref_tan = jnp.zeros_like(q[..., 0:3]).at[..., 0].set(1.0)
    ref_norm = jnp.zeros_like(q[..., 0:3]).at[..., 2].set(1.0)
    return jnp.concatenate([quat_rotate(q, ref_tan), quat_rotate(q, ref_norm)], axis=-1)


def quat_to_rotmat(q):
    """xyzw quaternion → 3x3 rotation matrix."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack([
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    ], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def rotmat_to_quat(m):
    """3x3 rotation matrix → xyzw quaternion (branch-free Shepperd)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate solutions, pick the numerically best by largest pivot.
    # The sqrt floor is 1e-12 (not 0): the winning pivot always has
    # 1 + pivot ≥ 1 so the value is unchanged, but un-selected candidates at
    # exactly 0 would otherwise produce inf·0 = NaN GRADIENTS through the
    # zero-cotangent branch (sqrt'(0) = inf) — hit when differentiating the
    # context-IK chain through identity rotations.
    def _psqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12)) / 2

    qw0 = _psqrt(1 + tr)
    s0 = jnp.maximum(4 * qw0, _EPS)
    c0 = jnp.stack([(m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0, qw0], axis=-1)

    qx1 = _psqrt(1 + m00 - m11 - m22)
    s1 = jnp.maximum(4 * qx1, _EPS)
    c1 = jnp.stack([qx1, (m01 + m10) / s1, (m02 + m20) / s1, (m21 - m12) / s1], axis=-1)

    qy2 = _psqrt(1 - m00 + m11 - m22)
    s2 = jnp.maximum(4 * qy2, _EPS)
    c2 = jnp.stack([(m01 + m10) / s2, qy2, (m12 + m21) / s2, (m02 - m20) / s2], axis=-1)

    qz3 = _psqrt(1 - m00 - m11 + m22)
    s3 = jnp.maximum(4 * qz3, _EPS)
    c3 = jnp.stack([(m02 + m20) / s3, (m12 + m21) / s3, qz3, (m10 - m01) / s3], axis=-1)

    pivots = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)
    idx = jnp.broadcast_to(best[..., None, None], cands.shape[:-2] + (1, 4))
    q = jnp.take_along_axis(cands, idx, axis=-2)[..., 0, :]
    return quat_unit(q)


# ---------------------------------------------------------------------------
# interpolation
# ---------------------------------------------------------------------------

def slerp(q0, q1, t):
    """Spherical interpolation, matching reference slerp's edge-case handling
    (`torch_utils.py:169-190`). `t` broadcastable to q[..., :1]."""
    cos_half = jnp.sum(q0 * q1, axis=-1)
    q1 = jnp.where((cos_half < 0)[..., None], -q1, q1)
    cos_half = jnp.abs(cos_half)[..., None]
    cos_half_c = jnp.clip(cos_half, 0.0, 1.0 - 1e-7)

    half = jnp.arccos(cos_half_c)
    sin_half = jnp.sqrt(1.0 - cos_half_c * cos_half_c)

    ratio_a = jnp.sin((1 - t) * half) / jnp.maximum(sin_half, _EPS)
    ratio_b = jnp.sin(t * half) / jnp.maximum(sin_half, _EPS)
    new_q = ratio_a * q0 + ratio_b * q1

    new_q = jnp.where(jnp.abs(sin_half) < 0.001, 0.5 * q0 + 0.5 * q1, new_q)
    new_q = jnp.where(cos_half >= 1, q0, new_q)
    return new_q


# ---------------------------------------------------------------------------
# heading (direction on xy plane)
# ---------------------------------------------------------------------------

def calc_heading(q):
    ref_dir = jnp.zeros_like(q[..., 0:3]).at[..., 0].set(1.0)
    rot_dir = quat_rotate(q, ref_dir)
    return jnp.arctan2(rot_dir[..., 1], rot_dir[..., 0])


def calc_heading_quat(q):
    heading = calc_heading(q)
    axis = jnp.zeros_like(q[..., 0:3]).at[..., 2].set(1.0)
    return quat_from_angle_axis(heading, axis)


def calc_heading_quat_inv(q):
    heading = calc_heading(q)
    axis = jnp.zeros_like(q[..., 0:3]).at[..., 2].set(1.0)
    return quat_from_angle_axis(-heading, axis)


def calc_heading_quat_inv_with_heading(q):
    heading = calc_heading(q)
    axis = jnp.zeros_like(q[..., 0:3]).at[..., 2].set(1.0)
    return quat_from_angle_axis(-heading, axis), heading


# SMPL rest orientation removal (`humanoid_smpl_im.py:766-770`):
# the SMPL mesh's canonical frame differs from the env frame by this fixed rotation.
_SMPL_BASE_ROT = np.array([0.5, 0.5, 0.5, 0.5], dtype=np.float32)  # xyzw


def remove_base_rot(q):
    base = jnp.asarray(_SMPL_BASE_ROT, dtype=q.dtype)
    return quat_mul(q, quat_conjugate(jnp.broadcast_to(base, q.shape)))


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------

def quat_angle(q, eps=1e-6):
    """Rotation angle magnitude of q (wxyz-free: uses |w|)."""
    s = jnp.clip(2 * (q[..., 3] ** 2) - 1, -1 + eps, 1 - eps)
    return jnp.arccos(s)


def quat_angle_diff(q1, q2):
    return quat_angle(quat_mul(q1, quat_conjugate(q2)))


def quat_between_two_vec(v1, v2, eps=1e-6):
    """Quaternion rotating v1 onto v2 (reference `torch_transform.py:126-154`, xyzw here)."""
    v1n = v1 / jnp.maximum(jnp.linalg.norm(v1, axis=-1, keepdims=True), _EPS)
    v2n = v2 / jnp.maximum(jnp.linalg.norm(v2, axis=-1, keepdims=True), _EPS)
    dot = jnp.sum(v1n * v2n, axis=-1)
    cross = jnp.cross(v1n, v2n)
    q = jnp.concatenate([cross, (1 + dot)[..., None]], axis=-1)

    # same direction → identity
    same = dot > 1 - eps
    q = jnp.where(same[..., None], quat_identity(q.shape[:-1]).astype(q.dtype), q)

    # opposite direction → rotate pi about any perpendicular axis
    opp = dot < -1 + eps
    vx = jnp.zeros_like(v1n).at[..., 0].set(1.0)
    vy = jnp.zeros_like(v1n).at[..., 1].set(1.0)
    use_y = jnp.abs(jnp.sum(v1n * vx, axis=-1)) >= 1 - eps
    perp_ref = jnp.where(use_y[..., None], vy, vx)
    perp = jnp.cross(perp_ref, v1n)
    perp = perp / jnp.maximum(jnp.linalg.norm(perp, axis=-1, keepdims=True), _EPS)
    q_pi = jnp.concatenate([perp, jnp.zeros_like(perp[..., :1])], axis=-1)
    q = jnp.where(opp[..., None], q_pi, q)
    return quat_unit(q)


def heading_to_vec(h_theta):
    return jnp.stack([jnp.cos(h_theta), jnp.sin(h_theta)], axis=-1)


def vec_to_heading(h_vec):
    return jnp.arctan2(h_vec[..., 1], h_vec[..., 0])
