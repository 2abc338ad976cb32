"""6D spatial-vector algebra (Featherstone convention) in pure JAX.

Motion vectors m = [ω; v], force vectors f = [n; f], all expressed in body-local
frames. Everything broadcasts over leading batch dims; all matrices are tiny
(3x3 / 6x6) so ops run on the VPU when vmapped over the env axis.

This is the numeric core of the TPU-native articulation engine that replaces
Isaac Gym/PhysX (`SURVEY.md` §2.1 row 1).
"""

from __future__ import annotations

import jax.numpy as jnp


def skew(v):
    """(..., 3) → (..., 3, 3) cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([
        zero, -z, y,
        z, zero, -x,
        -y, x, zero,
    ], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def spatial_inertia(mass, com, inertia_com):
    """Spatial inertia (6x6) about the body origin, body coords.

    mass (...,), com (..., 3) body-frame COM offset, inertia_com (..., 3, 3)
    rotational inertia about the COM.
    """
    c = skew(com)
    m = mass[..., None, None]
    top_left = inertia_com + m * (c @ jnp.swapaxes(c, -1, -2))
    top_right = m * c
    bot_left = m * jnp.swapaxes(c, -1, -2)
    eye3 = jnp.broadcast_to(jnp.eye(3), top_left.shape)
    bot_right = m * eye3
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bot = jnp.concatenate([bot_left, bot_right], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def inv33(M):
    """Closed-form adjugate inverse of (..., 3, 3) matrices.

    Batched `jnp.linalg.inv` lowers to tiny LU factorizations that serialize on
    TPU; the cofactor formula is pure elementwise math that vectorizes over the
    env batch.
    """
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    inv_det = 1.0 / det
    adj = jnp.stack([A, B, C, D, E, F, G, H, I], axis=-1)
    return (adj * inv_det[..., None]).reshape(M.shape)


def solve_spd66(A, b):
    """Solve A x = b for symmetric positive-definite (..., 6, 6) A via 2x2-block
    Schur complement with closed-form 3x3 inverses (no batched LU)."""
    A11 = A[..., :3, :3]
    A12 = A[..., :3, 3:]
    A21 = A[..., 3:, :3]
    A22 = A[..., 3:, 3:]
    b1 = b[..., :3]
    b2 = b[..., 3:]
    A11i = inv33(A11)
    A11i_A12 = A11i @ A12
    S = A22 - A21 @ A11i_A12
    Si = inv33(S)
    y1 = jnp.einsum("...ij,...j->...i", A11i, b1)
    x2 = jnp.einsum("...ij,...j->...i", Si, b2 - jnp.einsum("...ij,...j->...i", A21, y1))
    x1 = y1 - jnp.einsum("...ij,...j->...i", A11i_A12, x2)
    return jnp.concatenate([x1, x2], axis=-1)


def cross_motion(v, m):
    """v ×ₘ m for motion vectors: [w;u] × [m1;m2] = [w×m1; w×m2 + u×m1]."""
    w, u = v[..., :3], v[..., 3:]
    m1, m2 = m[..., :3], m[..., 3:]
    return jnp.concatenate([jnp.cross(w, m1), jnp.cross(w, m2) + jnp.cross(u, m1)], axis=-1)


def cross_force(v, f):
    """v ×* f for force vectors: [w;u] ×* [n;h] = [w×n + u×h; w×h]."""
    w, u = v[..., :3], v[..., 3:]
    n, h = f[..., :3], f[..., 3:]
    return jnp.concatenate([jnp.cross(w, n) + jnp.cross(u, h), jnp.cross(w, h)], axis=-1)


def xform_motion(E, p, m):
    """Transform motion vector from parent to child coords.

    E (..., 3, 3): rotation taking parent coords → child coords (R_child_in_parentᵀ);
    p (..., 3): child origin in parent frame. m (..., 6) in parent coords.
    """
    w, v = m[..., :3], m[..., 3:]
    w_c = jnp.einsum("...ij,...j->...i", E, w)
    v_c = jnp.einsum("...ij,...j->...i", E, v - jnp.cross(p, w))
    return jnp.concatenate([w_c, v_c], axis=-1)


def xform_force_to_parent(E, p, f):
    """Transform force vector from child coords back to parent coords (Xᵀ f)."""
    n, h = f[..., :3], f[..., 3:]
    Et = jnp.swapaxes(E, -1, -2)
    h_p = jnp.einsum("...ij,...j->...i", Et, h)
    n_p = jnp.einsum("...ij,...j->...i", Et, n) + jnp.cross(p, h_p)
    return jnp.concatenate([n_p, h_p], axis=-1)


def xform_inertia_to_parent(E, p, IA):
    """Transform an articulated-body inertia (6x6, child coords) to parent coords:
    Xᵀ IA X, with X built from (E, p)."""
    # X = [[E, 0], [-E p̂, E]]
    ph = skew(p)
    zero = jnp.zeros_like(E)
    top = jnp.concatenate([E, zero], axis=-1)
    bot = jnp.concatenate([-E @ ph, E], axis=-1)
    X = jnp.concatenate([top, bot], axis=-2)
    return jnp.swapaxes(X, -1, -2) @ IA @ X
