"""Structure-of-arrays (SoA) math core for the articulation engine.

TPU-first layout redesign (SURVEY.md §7 step 3): the engine's hot loop used
to operate on (N, 3, 3) / (N, 6, 6) arrays, whose minor-most 3x3/6x6 dims map
onto the TPU's (8, 128) vector tiles at ~2% lane utilization and whose batched
tiny matmuls lower to MXU-hostile dot_generals. Here every vector/matrix is a
Python tuple of (N,)-shaped component arrays, so every operation is a pure
elementwise VPU op over the env axis with 100% lane utilization, and XLA fuses
entire dynamics passes into a handful of loops over N.

Conventions:
  v3   = (x, y, z)                       each a (N,) array
  q4   = (x, y, z, w)                    xyzw, matching core.quat
  m33  = ((a00,a01,a02),(a10,a11,a12),(a20,a21,a22)) row-major
Broadcast shapes other than (N,) work transparently (all ops are jnp
elementwise); scalars are fine anywhere.

Semantics match `core.quat` exactly (same formulas, componentized), so AoS↔SoA
round-trips are bit-identical modulo float re-association.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-9


# ---------------------------------------------------------------------------
# pack / unpack at the AoS boundary
# ---------------------------------------------------------------------------

def unpack(a):
    """(..., K) → K-tuple of (...,) components."""
    return tuple(a[..., i] for i in range(a.shape[-1]))


def pack(v):
    return jnp.stack(v, axis=-1)


def unpack_m33(m):
    """(..., 3, 3) → m33 tuple-of-tuples."""
    return tuple(tuple(m[..., r, c] for c in range(3)) for r in range(3))


def pack_m33(m):
    return jnp.stack([jnp.stack(row, axis=-1) for row in m], axis=-2)


# ---------------------------------------------------------------------------
# vec3
# ---------------------------------------------------------------------------

def v_add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def v_sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def v_scale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def v_neg(a):
    return (-a[0], -a[1], -a[2])


def v_dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def v_cross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def v_norm(a):
    return jnp.sqrt(v_dot(a, a))


def v_zeros(like):
    z = jnp.zeros_like(like)
    return (z, z, z)


# ---------------------------------------------------------------------------
# quaternion (xyzw)
# ---------------------------------------------------------------------------

def q_mul(a, b):
    x1, y1, z1, w1 = a
    x2, y2, z2, w2 = b
    return (w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2,
            w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2)


def q_conj(q):
    return (-q[0], -q[1], -q[2], q[3])


def q_normalize(q):
    """Sign-fix (w ≥ 0) + unit-normalize, matching `quat.quat_normalize`."""
    s = jnp.where(q[3] < 0, -1.0, 1.0)
    x, y, z, w = q[0] * s, q[1] * s, q[2] * s, q[3] * s
    n = jnp.maximum(jnp.sqrt(x * x + y * y + z * z + w * w), _EPS)
    inv = 1.0 / n
    return (x * inv, y * inv, z * inv, w * inv)


def q_mul_norm(a, b):
    return q_normalize(q_mul(a, b))


def q_rotate(q, v):
    """Rotate v by q (same formula as `quat.quat_rotate`)."""
    qx, qy, qz, qw = q
    cx, cy, cz = (qy * v[2] - qz * v[1],
                  qz * v[0] - qx * v[2],
                  qx * v[1] - qy * v[0])
    a = 2.0 * qw * qw - 1.0
    d = 2.0 * (qx * v[0] + qy * v[1] + qz * v[2])
    tw = 2.0 * qw
    return (v[0] * a + cx * tw + qx * d,
            v[1] * a + cy * tw + qy * d,
            v[2] * a + cz * tw + qz * d)


def q_rotate_inv(q, v):
    return q_rotate(q_conj(q), v)


def q_to_m33(q):
    x, y, z, w = q
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return ((1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)),
            (2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)),
            (2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)))


def q_to_exp_map(q):
    """Matches `quat.quat_to_exp_map`: angle wrapped to (-pi, pi], zero near
    identity."""
    min_theta = 1e-5
    w = jnp.clip(q[3], -1.0, 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - w * w, 0.0))
    angle = 2.0 * jnp.arccos(w)
    angle = jnp.arctan2(jnp.sin(angle), jnp.cos(angle))
    mask = sin_theta > min_theta
    scale = jnp.where(mask, angle / jnp.maximum(sin_theta, _EPS), 0.0)
    return (q[0] * scale, q[1] * scale, q[2] * scale)


def exp_map_to_q(e):
    """Matches `quat.exp_map_to_quat` (incl. angle wrap + default +z axis)."""
    min_theta = 1e-5
    angle = jnp.sqrt(v_dot(e, e))
    inv = 1.0 / jnp.maximum(angle, _EPS)
    angle_w = jnp.arctan2(jnp.sin(angle), jnp.cos(angle))
    mask = jnp.abs(angle_w) > min_theta
    half = 0.5 * jnp.where(mask, angle_w, 0.0)
    s = jnp.sin(half)
    sx = jnp.where(mask, e[0] * inv, 0.0) * s
    sy = jnp.where(mask, e[1] * inv, 0.0) * s
    sz = jnp.where(mask, e[2] * inv, 1.0) * s
    return (sx, sy, sz, jnp.cos(half))


# ---------------------------------------------------------------------------
# mat33
# ---------------------------------------------------------------------------

def m_vec(m, v):
    return (m[0][0] * v[0] + m[0][1] * v[1] + m[0][2] * v[2],
            m[1][0] * v[0] + m[1][1] * v[1] + m[1][2] * v[2],
            m[2][0] * v[0] + m[2][1] * v[1] + m[2][2] * v[2])


def mT_vec(m, v):
    return (m[0][0] * v[0] + m[1][0] * v[1] + m[2][0] * v[2],
            m[0][1] * v[0] + m[1][1] * v[1] + m[2][1] * v[2],
            m[0][2] * v[0] + m[1][2] * v[1] + m[2][2] * v[2])


def m_T(m):
    return tuple(tuple(m[c][r] for c in range(3)) for r in range(3))


def m_add(a, b):
    return tuple(tuple(a[r][c] + b[r][c] for c in range(3)) for r in range(3))


def m_sub(a, b):
    return tuple(tuple(a[r][c] - b[r][c] for c in range(3)) for r in range(3))


def m_scale(a, s):
    return tuple(tuple(a[r][c] * s for c in range(3)) for r in range(3))


def m_mul(a, b):
    """a @ b."""
    return tuple(tuple(
        a[r][0] * b[0][c] + a[r][1] * b[1][c] + a[r][2] * b[2][c]
        for c in range(3)) for r in range(3))


def mT_mul(a, b):
    """aᵀ @ b."""
    return tuple(tuple(
        a[0][r] * b[0][c] + a[1][r] * b[1][c] + a[2][r] * b[2][c]
        for c in range(3)) for r in range(3))


def m_mulT(a, b):
    """a @ bᵀ."""
    return tuple(tuple(
        a[r][0] * b[c][0] + a[r][1] * b[c][1] + a[r][2] * b[c][2]
        for c in range(3)) for r in range(3))


def m_outer(u, v):
    """u vᵀ."""
    return tuple(tuple(u[r] * v[c] for c in range(3)) for r in range(3))


def m_skew(v):
    z = jnp.zeros_like(v[0])
    return ((z, -v[2], v[1]),
            (v[2], z, -v[0]),
            (-v[1], v[0], z))


def m_eye_scaled(s, like):
    z = jnp.zeros_like(like)
    one = s
    return ((one, z, z), (z, one, z), (z, z, one))


def m_inv(m):
    """Closed-form adjugate inverse (cofactor expansion, `spatial.inv33`)."""
    a, b, c = m[0]
    d, e, f = m[1]
    g, h, i = m[2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    inv_det = 1.0 / (a * A + b * D + c * G)
    return ((A * inv_det, B * inv_det, C * inv_det),
            (D * inv_det, E * inv_det, F * inv_det),
            (G * inv_det, H * inv_det, I * inv_det))


# ---------------------------------------------------------------------------
# spatial (6D) in block form: motion m = (ω v3, v v3); force f = (n v3, h v3)
# articulated-body inertia IA = (A m33, B m33, D m33) with full form
# [[A, B], [Bᵀ, D]], A and D symmetric.
# ---------------------------------------------------------------------------

def sp_cross_motion(v, m):
    """v ×ₘ m = [w×m1; w×m2 + u×m1]."""
    w, u = v
    m1, m2 = m
    return (v_cross(w, m1), v_add(v_cross(w, m2), v_cross(u, m1)))


def sp_cross_force(v, f):
    """v ×* f = [w×n + u×h; w×h]."""
    w, u = v
    n, h = f
    return (v_add(v_cross(w, n), v_cross(u, h)), v_cross(w, h))


def sp_xform_motion(E, p, m):
    """Parent→child motion transform: ω_c = E ω; v_c = E (v − p × ω)."""
    w, v = m
    return (m_vec(E, w), m_vec(E, v_sub(v, v_cross(p, w))))


def sp_xform_force_to_parent(E, p, f):
    """Child→parent force transform (Xᵀ f): h_p = Eᵀ h; n_p = Eᵀ n + p × h_p."""
    n, h = f
    h_p = mT_vec(E, h)
    n_p = v_add(mT_vec(E, n), v_cross(p, h_p))
    return (n_p, h_p)


def sp_inertia(mass, com, I_com):
    """Spatial inertia about the body origin as (A, B, D) blocks:
    A = I_com + m ĉ ĉᵀ, B = m ĉ, D = m I₃  (`spatial.spatial_inertia`)."""
    cx, cy, cz = com
    m = mass
    # ĉ ĉᵀ = −ĉ² = |c|² I − c cᵀ, expanded elementwise
    c2 = cx * cx + cy * cy + cz * cz
    A = tuple(tuple(
        I_com[r][c_] + m * ((c2 if r == c_ else 0.0) - com[r] * com[c_])
        for c_ in range(3)) for r in range(3))
    B = m_scale(m_skew(com), m)
    z = jnp.zeros_like(m * cx)
    D = ((m, z, z), (z, m, z), (z, z, m))
    return A, B, D


def sp_solve_sym66(A, B, D, b1, b2):
    """Solve [[A, B],[Bᵀ, D]] [x1; x2] = [b1; b2] via Schur complement on A
    (`spatial.solve_spd66` block form)."""
    Ai = m_inv(A)
    Ai_B = m_mul(Ai, B)
    S = m_sub(D, mT_mul(B, Ai_B))          # D − Bᵀ A⁻¹ B
    Si = m_inv(S)
    y1 = m_vec(Ai, b1)
    x2 = m_vec(Si, v_sub(b2, mT_vec(B, y1)))
    x1 = v_sub(y1, m_vec(Ai_B, x2))
    return x1, x2


def sp_xform_inertia_to_parent(E, p, A, B, D):
    """Xᵀ [[A,B],[Bᵀ,D]] X with X = [[E,0],[F,E]], F = −E p̂.

    Returns parent-frame blocks (A', B', D'):
      T1 = A E + B F;  T2 = Bᵀ E + D F
      A' = Eᵀ T1 + Fᵀ T2;  B' = (Eᵀ B + Fᵀ D) E;  D' = Eᵀ D E
    """
    F = m_scale(m_mul(E, m_skew(p)), -1.0)
    T1 = m_add(m_mul(A, E), m_mul(B, F))
    T2 = m_add(mT_mul(B, E), m_mul(D, F))
    Ap = m_add(mT_mul(E, T1), mT_mul(F, T2))
    Bp = m_mul(m_add(mT_mul(E, B), mT_mul(F, D)), E)
    Dp = mT_mul(E, m_mul(D, E))
    return Ap, Bp, Dp
