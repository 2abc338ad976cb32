"""Batched analytic twist-and-swing inverse kinematics for the SMPL skeleton.

TPU-native re-design of the HybrIK-style IK the reference uses inside the
imitation network's context pipeline (`embodied_pose/utils/hybrik.py:1030
batch_inverse_kinematics_transform`, pelvis SVD `hybrik.py:727`, consumed by
`embodied_pose/models/im_network_builder.py:78-115 perform_ik`): given target
joint positions (possibly corrupted video estimates), per-bone twist angles
(phis, as cos/sin), and the rest-pose skeleton, recover per-joint rotation
matrices whose FK reproduces the targets.

Everything here is jit/vmap-safe with static shapes: the kinematic tree is
processed level-by-level with *static* index lists (a Python loop over 9
levels that unrolls at trace time into batched gathers + einsum matmuls on
the MXU), degenerate cases are handled with `where` masks instead of index
filtering, and the two SVD orientation fits (pelvis, spine) run as batched
`jnp.linalg.svd` over (B, 3, 3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .smpl import SMPL_PARENTS, smpl_children_map

_EPS = 1e-8


def _safe_norm(x, axis=-1, keepdims=True):
    """Norm with a finite gradient at 0 (`jnp.linalg.norm`'s gradient is NaN
    at exactly zero, which occluded/zeroed context joints hit when the IK is
    differentiated through the learned twist heads)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + 1e-12)

# Topological levels of the SMPL tree (joints whose parents all appear in
# earlier levels). Level 3 is the 3-child spine joint (Chest=9, fit by SVD
# over Neck/L_Thorax/R_Thorax); the last level holds the leaves whose local
# rotation cannot be inferred from positions and comes from `leaf_rotmats`.
IK_LEVELS = [
    [0],
    [1, 2, 3],
    [4, 5, 6],
    [9],
    [7, 8, 12, 13, 14],
    [16, 17],
    [18, 19],
    [20, 21],
    [10, 11, 15, 22, 23],
]
SPINE_JOINT = 9
SPINE_CHILDREN = [12, 13, 14]
PELVIS_CHILDREN = [1, 2, 3]
LEAF_JOINTS = IK_LEVELS[-1]

_PARENTS = np.asarray(SMPL_PARENTS)
_CHILDREN = smpl_children_map()


def _kabsch(rest_cols, target_cols):
    """Batched orthogonal Procrustes: rotation R minimizing |R@rest - target|.

    rest_cols/target_cols: (B, 3, K) matrices of K corresponding vectors.
    Degenerate (all-zero) systems fall back to identity via a `where` mask
    (the reference filters indices instead, `hybrik.py:749-763`).
    """
    S = rest_cols @ jnp.swapaxes(target_cols, -1, -2)  # (B,3,3)
    degenerate = jnp.abs(S).sum(axis=(-1, -2), keepdims=True) < _EPS
    S_safe = jnp.where(degenerate, jnp.eye(3, dtype=S.dtype), S)
    U, _, Vh = jnp.linalg.svd(S_safe)
    V = jnp.swapaxes(Vh, -1, -2)
    det = jnp.linalg.det(V @ jnp.swapaxes(U, -1, -2))
    sign = jnp.where(det == 0, 1.0, jnp.sign(det))
    D = jnp.broadcast_to(jnp.eye(3, dtype=S.dtype), S.shape)
    D = D.at[..., 2, 2].multiply(sign)
    R = V @ D @ jnp.swapaxes(U, -1, -2)
    return jnp.where(degenerate, jnp.eye(3, dtype=S.dtype), R)


def _rodrigues(axis, cos, sin):
    """Rotation matrices from unit axis (..., 3) and cos/sin (..., 1)."""
    rx, ry, rz = axis[..., 0:1], axis[..., 1:2], axis[..., 2:3]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack([
        jnp.concatenate([zeros, -rz, ry], axis=-1),
        jnp.concatenate([rz, zeros, -rx], axis=-1),
        jnp.concatenate([-ry, rx, zeros], axis=-1),
    ], axis=-2)
    ident = jnp.eye(3, dtype=axis.dtype)
    c = cos[..., None]
    s = sin[..., None]
    return ident + s * K + (1.0 - c) * (K @ K)


def batch_inverse_kinematics(pose_skeleton, phis, rest_pose, leaf_rotmats=None,
                             ignore_outlier: bool = False,
                             outlier_thresh: float = 0.015):
    """Twist-swing IK over the SMPL tree (semantics of `hybrik.py:1030`).

    Args:
      pose_skeleton: (B, 24, 3) target global joint positions.
      phis: (B, 23, 2) twist (cos, sin) per non-root joint, any scale
        (normalized internally).
      rest_pose: (B, 24, 3) rest (template) joint positions.
      leaf_rotmats: (B, 5, 3, 3) local rotations for the 5 leaf joints
        (toes/head/hands), identity if None.
      ignore_outlier: replace per-bone targets that moved > `outlier_thresh`
        from the (bone-length-normalized) observed relative positions, as in
        `hybrik.py:1167-1179`.

    Returns:
      (local_rotmats (B,24,3,3), global_rotmats (B,24,3,3),
       global_joints (B,24,3)) — global_joints is the FK reconstruction of
      the IK solution, root-anchored at rest_pose[:, 0].
    """
    B = pose_skeleton.shape[0]
    dtype = pose_skeleton.dtype
    parents = _PARENTS
    children = _CHILDREN

    if leaf_rotmats is None:
        leaf_rotmats = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (B, 5, 3, 3))

    # bone vectors relative to parent, root entry = root rest position
    rel_rest = rest_pose.at[:, 1:].add(-rest_pose[:, parents[1:]])
    rel_pose = pose_skeleton.at[:, 1:].add(-pose_skeleton[:, parents[1:]])
    rel_pose = rel_pose.at[:, 0].set(rel_rest[:, 0])
    # target skeleton re-rooted at the rest root
    final_pose = pose_skeleton - pose_skeleton[:, 0:1] + rel_rest[:, 0:1]

    phis = phis / (_safe_norm(phis) + _EPS)

    chain = jnp.zeros((B, 24, 3, 3), dtype)   # global rotations
    local = jnp.zeros((B, 24, 3, 3), dtype)   # local rotations
    joints = jnp.zeros((B, 24, 3), dtype)     # FK-reconstructed positions
    joints = joints.at[:, 0].set(rel_rest[:, 0])

    # root orientation: Procrustes over the pelvis' three children
    R0 = _kabsch(
        jnp.stack([rel_rest[:, c] for c in PELVIS_CHILDREN], axis=-1),
        jnp.stack([rel_pose[:, c] for c in PELVIS_CHILDREN], axis=-1))
    chain = chain.at[:, 0].set(R0)
    local = local.at[:, 0].set(R0)

    leaf_slot = {j: i for i, j in enumerate(LEAF_JOINTS)}

    for level in IK_LEVELS[1:]:
        idx = np.asarray(level)
        par = parents[idx]
        # place this level's joints by rotating their rest bones
        placed = joints[:, par] + jnp.einsum(
            "bkij,bkj->bki", chain[:, par], rel_rest[:, idx])
        joints = joints.at[:, idx].set(placed)

        if level == IK_LEVELS[-1]:
            rot = jnp.stack([leaf_rotmats[:, leaf_slot[j]] for j in level],
                            axis=1)
        elif level == [SPINE_JOINT]:
            # 3-child SVD fit in the parent frame (`hybrik.py:776-815`).
            # The SVD's VJP is NaN for repeated singular values (common for
            # degenerate/zeroed point sets), so the fit is treated as a
            # data-driven constant: gradients to the learned phis still flow
            # through every swing-twist joint.
            tgt = final_pose[:, SPINE_CHILDREN] - placed[:, 0:1]
            tgt = jnp.einsum("bji,bkj->bki", chain[:, parents[SPINE_JOINT]],
                             tgt)
            tgt = jax.lax.stop_gradient(tgt)
            rst = rel_rest[:, SPINE_CHILDREN]
            rot = _kabsch(jnp.swapaxes(rst, 1, 2),
                          jnp.swapaxes(tgt, 1, 2))[:, None]
        else:
            ch = children[idx]
            # desired child offset, rotated back into this joint's frame
            rel_opt = final_pose[:, ch] - placed
            if ignore_outlier:
                orig = rel_pose[:, ch]
                t_norm = _safe_norm(rel_rest[:, ch])
                orig = orig * t_norm / (_safe_norm(orig) + _EPS)
                diff = _safe_norm(rel_opt - orig)
                rel_opt = jnp.where(diff > outlier_thresh, orig, rel_opt)
            child_final = jnp.einsum("bkji,bkj->bki", chain[:, par], rel_opt)
            child_rest = rel_rest[:, ch]

            f_norm = _safe_norm(child_final)
            r_norm = _safe_norm(child_rest)
            axis = jnp.cross(child_rest, child_final)
            a_norm = _safe_norm(axis)
            cos = (child_rest * child_final).sum(-1, keepdims=True) / (
                r_norm * f_norm + _EPS)
            sin = a_norm / (r_norm * f_norm + _EPS)
            swing = _rodrigues(axis / (a_norm + _EPS), cos, sin)

            spin_axis = child_rest / (r_norm + _EPS)
            pc = phis[:, idx - 1]  # phi rows are indexed by joint-1
            twist = _rodrigues(spin_axis, pc[..., 0:1], pc[..., 1:2])
            rot = swing @ twist

        chain = chain.at[:, idx].set(chain[:, par] @ rot)
        local = local.at[:, idx].set(rot)

    return local, chain, joints


def batch_inverse_kinematics_naive(pose_skeleton, phis, rest_pose,
                                   leaf_rotmats=None):
    """Naive variant (`hybrik.py:1241`): per-bone swing from the *observed*
    relative bone vectors without re-anchoring to the FK chain — cheaper and
    the default when `ik_type != 'optimized'` (`im_network_builder.py:102`)."""
    local, chain, _ = batch_inverse_kinematics(
        pose_skeleton, phis, rest_pose, leaf_rotmats, ignore_outlier=True,
        outlier_thresh=0.0)  # thresh 0 ⇒ always use observed bone vectors
    return local, chain


def perform_context_ik(body_pos_smpl, rest_pose, phis=None, leaf_rot6d=None):
    """Context-pipeline wrapper (`im_network_builder.py:78-115 perform_ik`):
    re-roots targets to the rest root, applies residual-parameterized phis
    (network outputs added to the identity twist [1, 0]) and leaf rot6d
    (added to identity 6d), returns (local rotmats, global rotmats, joints).

    body_pos_smpl: (B, 24, 3) SMPL-order joint positions.
    phis: optional (B, 46) or (B, 23, 2) twist residuals.
    leaf_rot6d: optional (B, 30) or (B, 5, 6) leaf rotation residuals.
    """
    from . import rot as R

    B = body_pos_smpl.shape[0]
    dtype = body_pos_smpl.dtype
    if phis is None:
        phis = jnp.broadcast_to(jnp.array([1.0, 0.0], dtype), (B, 23, 2))
    else:
        phis = phis.reshape(B, 23, 2) + jnp.array([1.0, 0.0], dtype)
    if leaf_rot6d is None:
        leaf_rotmats = None
    else:
        ident6 = jnp.array([1, 0, 0, 0, 1, 0], dtype)
        leaf_rotmats = R.rot6d_to_rotmat(
            leaf_rot6d.reshape(B, 5, 6) + ident6)

    root_diff = rest_pose[:, 0:1] - body_pos_smpl[:, 0:1]
    targets = body_pos_smpl + root_diff
    local, chain, joints = batch_inverse_kinematics(
        targets, phis, rest_pose, leaf_rotmats)
    return local, chain, joints - root_diff
