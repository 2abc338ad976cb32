"""Skeleton trees, poses, and motions (TPU-native poselib equivalent).

Replaces `/root/reference/poselib/poselib/skeleton/skeleton3d.py` with a functional
design: `SkeletonTree` is a static pytree of arrays; forward kinematics and
local↔global conversion are pure jnp functions usable under jit/vmap; motion
velocity estimation (gaussian-filtered finite differences, matching
`skeleton3d.py:1226-1249`) is host-side numpy since it runs in the data pipeline.

Quaternions are xyzw throughout (poselib convention).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import gaussian_filter1d

from . import quat as Q


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class SkeletonTree:
    """Static kinematic tree: node names + parent indices + local (rest) translations.

    parent_indices[0] == -1 for the root. Nodes are topologically ordered
    (parent index < child index), as produced by MJCF/SMPL construction.
    """

    node_names: tuple
    parent_indices: np.ndarray  # (J,) int32, static
    local_translation: jnp.ndarray  # (J, 3)

    @property
    def num_joints(self) -> int:
        return len(self.node_names)

    def index(self, name: str) -> int:
        return self.node_names.index(name)

    def tree_flatten(self):
        return (self.local_translation,), (self.node_names, tuple(np.asarray(self.parent_indices).tolist()))

    @classmethod
    def tree_unflatten(cls, aux, children):
        names, parents = aux
        return cls(tuple(names), np.asarray(parents, dtype=np.int32), children[0])

    def to_dict(self):
        return {
            "node_names": list(self.node_names),
            "parent_indices": np.asarray(self.parent_indices).tolist(),
            "local_translation": np.asarray(self.local_translation).tolist(),
        }

    @classmethod
    def from_dict(cls, d):
        return cls(
            tuple(d["node_names"]),
            np.asarray(d["parent_indices"], dtype=np.int32),
            jnp.asarray(np.asarray(d["local_translation"], dtype=np.float32)),
        )


# ---------------------------------------------------------------------------
# forward kinematics (pure, jit/vmap friendly)
# ---------------------------------------------------------------------------

def fk_local_to_global(tree: SkeletonTree, local_rot, root_translation,
                       local_translation=None):
    """Local joint rotations → global rotations + translations.

    local_rot: (..., J, 4) xyzw; root_translation: (..., 3).
    Returns (global_rot (..., J, 4), global_pos (..., J, 3)).

    Matches poselib semantics (`skeleton3d.py:410-520`):
      T_global[j] = T_global[parent[j]] ∘ (local_translation[j], local_rot[j]).
    The tree is static so the loop unrolls at trace time (J ≤ ~26).
    """
    parents = np.asarray(tree.parent_indices)
    lt = tree.local_translation if local_translation is None else local_translation
    J = len(parents)

    g_rot: List = [None] * J
    g_pos: List = [None] * J
    g_rot[0] = local_rot[..., 0, :]
    g_pos[0] = root_translation
    for j in range(1, J):
        p = int(parents[j])
        g_rot[j] = Q.quat_mul_norm(g_rot[p], local_rot[..., j, :])
        offset = jnp.broadcast_to(lt[..., j, :], g_pos[p].shape)
        g_pos[j] = g_pos[p] + Q.quat_rotate(g_rot[p], offset)
    return jnp.stack(g_rot, axis=-2), jnp.stack(g_pos, axis=-2)


def global_to_local_rot(tree: SkeletonTree, global_rot):
    """Inverse of FK rotation composition: global → local rotations."""
    parents = np.asarray(tree.parent_indices)
    J = len(parents)
    locals_: List = [global_rot[..., 0, :]]
    for j in range(1, J):
        p = int(parents[j])
        locals_.append(Q.quat_mul_norm(Q.quat_inverse(global_rot[..., p, :]), global_rot[..., j, :]))
    return jnp.stack(locals_, axis=-2)


# ---------------------------------------------------------------------------
# motion container
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class SkeletonMotion:
    """A motion clip: local rotations + root translation over time, with cached
    global quantities and filtered velocities (poselib `SkeletonMotion` equivalent)."""

    tree: SkeletonTree
    local_rotation: np.ndarray  # (T, J, 4) xyzw
    root_translation: np.ndarray  # (T, 3)
    fps: float
    global_rotation: np.ndarray = None  # (T, J, 4)
    global_translation: np.ndarray = None  # (T, J, 3)
    global_velocity: np.ndarray = None  # (T, J, 3)
    global_angular_velocity: np.ndarray = None  # (T, J, 3)

    def __post_init__(self):
        if self.global_rotation is None:
            g_rot, g_pos = fk_local_to_global(
                self.tree, jnp.asarray(self.local_rotation), jnp.asarray(self.root_translation))
            self.global_rotation = np.asarray(g_rot)
            self.global_translation = np.asarray(g_pos)
        if self.global_velocity is None:
            self.global_velocity = compute_velocity(self.global_translation, 1.0 / self.fps)
            self.global_angular_velocity = compute_angular_velocity(self.global_rotation, 1.0 / self.fps)

    @property
    def num_frames(self) -> int:
        return self.local_rotation.shape[0]

    @property
    def global_root_velocity(self):
        return self.global_velocity[:, 0]

    @property
    def global_root_angular_velocity(self):
        return self.global_angular_velocity[:, 0]

    def to_dict(self):
        return {
            "tree": self.tree.to_dict(),
            "local_rotation": self.local_rotation,
            "root_translation": self.root_translation,
            "fps": self.fps,
        }

    @classmethod
    def from_dict(cls, d):
        return cls(
            tree=SkeletonTree.from_dict(d["tree"]),
            local_rotation=np.asarray(d["local_rotation"], dtype=np.float32),
            root_translation=np.asarray(d["root_translation"], dtype=np.float32),
            fps=float(d["fps"]),
        )


def compute_velocity(p: np.ndarray, time_delta: float) -> np.ndarray:
    """Gaussian-filtered (sigma=2) central-difference velocity along axis 0
    (matches `skeleton3d.py:1226-1234`)."""
    v = np.gradient(np.asarray(p), axis=0) / time_delta
    return gaussian_filter1d(v, 2, axis=0, mode="nearest").astype(np.float32)


def compute_angular_velocity(r: np.ndarray, time_delta: float) -> np.ndarray:
    """Angular velocity from frame-to-frame quaternion differences, gaussian-filtered
    (matches `skeleton3d.py:1236-1249`)."""
    r = np.asarray(r)
    q0 = jnp.asarray(r[:-1])
    q1 = jnp.asarray(r[1:])
    dq = Q.quat_mul_norm(q1, Q.quat_inverse(q0))
    angle, axis = Q.quat_to_angle_axis(dq)
    av = np.asarray(axis * angle[..., None]) / time_delta
    av = np.concatenate([av, np.zeros_like(av[:1])], axis=0)
    return gaussian_filter1d(av, 2, axis=0, mode="nearest").astype(np.float32)


# ---------------------------------------------------------------------------
# retargeting (poselib `retarget_to_by_tpose`, `skeleton3d.py:793-1003`)
# ---------------------------------------------------------------------------

def retarget_motion_by_tpose(
    motion: SkeletonMotion,
    source_tpose_local_rot: np.ndarray,
    target_tree: SkeletonTree,
    target_tpose_local_rot: np.ndarray,
    joint_mapping: dict,
    rotation_to_target: np.ndarray,
    scale_to_target: float,
) -> SkeletonMotion:
    """Transfer a motion between skeletons via t-pose-relative global rotations.

    For each mapped joint: R_target_global = R_align · R_src_global · R_src_tpose^-1 · R_tgt_tpose,
    root translation scaled by `scale_to_target` and rotated by `rotation_to_target`.
    """
    src_tree = motion.tree
    # source t-pose global rotations
    tp_rot, _ = fk_local_to_global(src_tree, jnp.asarray(source_tpose_local_rot)[None],
                                   jnp.zeros((1, 3)))
    tp_rot = np.asarray(tp_rot)[0]
    tgt_tp_rot, _ = fk_local_to_global(target_tree, jnp.asarray(target_tpose_local_rot)[None],
                                       jnp.zeros((1, 3)))
    tgt_tp_rot = np.asarray(tgt_tp_rot)[0]

    T = motion.num_frames
    J_t = target_tree.num_joints
    align = jnp.asarray(rotation_to_target, dtype=jnp.float32)

    tgt_global = np.tile(np.asarray(
        fk_local_to_global(target_tree, jnp.asarray(target_tpose_local_rot)[None], jnp.zeros((1, 3)))[0])[0],
        (T, 1, 1))
    for src_name, tgt_name in joint_mapping.items():
        si = src_tree.index(src_name)
        ti = target_tree.index(tgt_name)
        src_g = jnp.asarray(motion.global_rotation[:, si])
        rel = Q.quat_mul_norm(src_g, Q.quat_inverse(jnp.asarray(tp_rot[si])))
        rel = Q.quat_mul_norm(jnp.broadcast_to(align, rel.shape), rel)
        tgt_global[:, ti] = np.asarray(Q.quat_mul_norm(rel, jnp.asarray(tgt_tp_rot[ti])))

    local_rot = np.asarray(global_to_local_rot(target_tree, jnp.asarray(tgt_global)))
    root_t = np.asarray(Q.quat_rotate(
        jnp.broadcast_to(align, (T, 4)), jnp.asarray(motion.root_translation))) * scale_to_target
    return SkeletonMotion(tree=target_tree, local_rotation=local_rot.astype(np.float32),
                          root_translation=root_t.astype(np.float32), fps=motion.fps)
