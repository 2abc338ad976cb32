"""Articulation model and simulation state containers.

Replaces Isaac Gym's asset/actor machinery (`gym.load_asset`/`create_actor`,
`humanoid_smpl.py:286-367`) with a *parametric* device model: one compiled
program, per-env heterogeneous bodies as array inputs (betas → offsets, masses,
inertias), so mixed body shapes never trigger recompilation (SURVEY.md §7).

All per-env quantities carry a leading env axis N. Structure (parents, gains
layout, contact-point wiring) is static.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ArticulationModel:
    """Reduced-coordinate articulated body: free root + (J-1) spherical joints.

    Static fields (aux data, hashable):
      parents: tuple of parent body indices, parents[0] == -1
      names:   body names in simulation (mujoco) order
    Array fields, leading env axis N:
      joint_pos:    (N, J, 3) joint (= body-frame origin) position in parent frame
      body_com:     (N, J, 3) COM offset in body frame
      body_mass:    (N, J)
      body_inertia: (N, J, 3, 3) about COM, body frame
      kp, kd:       (N, J-1) PD gains per joint (applied per-axis)
      torque_lim:   (N, J-1) max |torque| per joint axis
      armature:     (N, J-1) rotor inertia added to joint-space diagonal
    Contact spheres (static count P):
      contact_body:   tuple of body ids, length P
      contact_offset: (N, P, 3) body-frame offsets
      contact_radius: (N, P)
    Self-collision (static):
      collision_pairs: tuple of (sphere_i, sphere_j) CONTACT-SPHERE index
        pairs checked for sphere-sphere penetration each substep — the
        penalty analogue of the reference's PhysX collision-filter bitmasks
        (`humanoid_smpl_im_mvae.py:388-417`); empty = self-collision off
    """

    parents: Tuple[int, ...]
    names: Tuple[str, ...]
    joint_pos: jnp.ndarray
    body_com: jnp.ndarray
    body_mass: jnp.ndarray
    body_inertia: jnp.ndarray
    kp: jnp.ndarray
    kd: jnp.ndarray
    torque_lim: jnp.ndarray
    armature: jnp.ndarray
    contact_body: Tuple[int, ...]
    contact_offset: jnp.ndarray
    contact_radius: jnp.ndarray
    collision_pairs: Tuple[Tuple[int, int], ...] = ()

    def tree_flatten(self):
        arrays = (self.joint_pos, self.body_com, self.body_mass, self.body_inertia,
                  self.kp, self.kd, self.torque_lim, self.armature,
                  self.contact_offset, self.contact_radius)
        return arrays, (self.parents, self.names, self.contact_body,
                        self.collision_pairs)

    @classmethod
    def tree_unflatten(cls, aux, arrays):
        parents, names, contact_body, collision_pairs = aux
        return cls(parents, names, *arrays[:8], contact_body, *arrays[8:],
                   collision_pairs=collision_pairs)

    @property
    def num_bodies(self) -> int:
        return len(self.parents)

    @property
    def num_envs(self) -> int:
        return self.joint_pos.shape[0]

    @property
    def num_dof(self) -> int:
        return 3 * (self.num_bodies - 1)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ArticulationState:
    """Generalized-coordinate state, leading env axis N.

    root_pos (N,3) world; root_quat (N,4) xyzw world;
    root_vel (N,6) spatial [ω; v] of the root IN ROOT BODY COORDS at body origin;
    joint_quat (N,J-1,4) child-relative-to-parent; joint_omega (N,J-1,3) relative
    angular velocity in child coords.
    """

    root_pos: jnp.ndarray
    root_quat: jnp.ndarray
    root_vel: jnp.ndarray
    joint_quat: jnp.ndarray
    joint_omega: jnp.ndarray

    def tree_flatten(self):
        return (self.root_pos, self.root_quat, self.root_vel, self.joint_quat, self.joint_omega), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def zeros(cls, num_envs: int, num_bodies: int, root_h: float = 1.0):
        J = num_bodies
        return cls(
            root_pos=jnp.tile(jnp.array([0.0, 0.0, root_h]), (num_envs, 1)),
            root_quat=jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (num_envs, 1)),
            root_vel=jnp.zeros((num_envs, 6)),
            joint_quat=jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (num_envs, J - 1, 1)),
            joint_omega=jnp.zeros((num_envs, J - 1, 3)),
        )


@dataclasses.dataclass(frozen=True)
class ContactParams:
    """Penalty-contact material parameters (compile-time constants)."""

    kn: float = 3.0e4       # normal stiffness N/m
    dn: float = 1.2e3       # normal damping  N·s/m
    mu: float = 1.0         # Coulomb friction coefficient
    kt: float = 2.0e3       # tangential damping used for friction regularization
    vt_eps: float = 1e-4


GRAVITY = np.array([0.0, 0.0, -9.81], dtype=np.float32)
