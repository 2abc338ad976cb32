"""Racket geometry: grip frames + pose inference from the wrist.

TPU-native port-in-behavior of `vid2player/utils/racket.py:10-268`: a racket
is a rigid extension of the wrist frame. Each grip defines canonical
direction/normal vectors in the wrist's local frame; the head center sits at
`wrist + dir * (handle + shaft + head_radius)`.

`racket_with_fk` recomputes the wrist world transform from joint rotation
matrices + bind-pose-relative joint offsets along the pelvis→hand chain
(reference `racket.py:234-268`) — used when only kinematic MVAE joint
rotations exist. `racket_from_wrist` uses simulated rigid-body state directly
(reference `infer_without_fk`, `racket.py:210-232`).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

# SMPL joint indices (reference `utils/pose.py:1-27`)
PELVIS, TORSO, SPINE, CHEST = 0, 3, 6, 9
L_COLLAR, L_SHOULDER, L_ELBOW, L_WRIST, L_HAND = 13, 16, 18, 20, 22
R_COLLAR, R_SHOULDER, R_ELBOW, R_WRIST, R_HAND = 14, 17, 19, 21, 23

RIGHT_CHAIN = (PELVIS, TORSO, SPINE, CHEST, R_COLLAR, R_SHOULDER, R_ELBOW,
               R_WRIST, R_HAND)
LEFT_CHAIN = (PELVIS, TORSO, SPINE, CHEST, L_COLLAR, L_SHOULDER, L_ELBOW,
              L_WRIST, L_HAND)

_S2 = 1.0 / math.sqrt(2.0)

RACKET_GRIPS: Dict[str, dict] = {
    # reference racket.py:10-45
    "eastern": {
        "handle_length": 0.2, "shaft_length": 0.15, "head_radius": 0.15,
        "racket_dir": (-1.0, 0.0, 0.0), "racket_normal": (0.0, 1.0, 0.0),
        "racket_dir_vert": (0.0, 0.0, -1.0),
    },
    "semi_western": {
        "handle_length": 0.2, "shaft_length": 0.15, "head_radius": 0.15,
        "racket_dir": (-1.0, 0.0, 0.0), "racket_normal": (0.0, _S2, _S2),
        "racket_dir_vert": (0.0, _S2, -_S2),
    },
    "lefthand_semi_western": {
        "handle_length": 0.2, "shaft_length": 0.15, "head_radius": 0.15,
        "racket_dir": (1.0, 0.0, 0.0), "racket_normal": (0.0, _S2, _S2),
        "racket_dir_vert": (0.0, _S2, -_S2),
    },
}


def grip_arrays(grip: str = "eastern"):
    g = RACKET_GRIPS[grip]
    reach = g["handle_length"] + g["shaft_length"] + g["head_radius"]
    return (np.asarray(g["racket_dir"], np.float32),
            np.asarray(g["racket_normal"], np.float32), reach,
            g["head_radius"])


def racket_from_wrist(wrist_pos, wrist_rotmat, grip: str = "eastern"
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(head_center (...,3), normal (...,3)) from world wrist pose."""
    dir_c, normal_c, reach, _ = grip_arrays(grip)
    rdir = wrist_rotmat @ dir_c
    rnormal = wrist_rotmat @ normal_c
    return wrist_pos + rdir * reach, rnormal


def racket_with_fk(joint_rotmat, joint_pos_bind_rel, root_pos,
                   grip: str = "eastern", righthand: bool = True):
    """FK along pelvis→hand (reference `racket.py:234-268`).

    joint_rotmat (N,J,3,3) local joint rotations (J=24 SMPL order);
    joint_pos_bind_rel (N,J,3) bind-pose joint offsets relative to parent
    *along the chain*; root_pos (N,3). Returns dict with racket head pos,
    normal, wrist/hand world pos."""
    chain = RIGHT_CHAIN if righthand else LEFT_CHAIN
    Rm = joint_rotmat[:, jnp.asarray(chain)]
    off = joint_pos_bind_rel[:, jnp.asarray(chain)]

    # accumulate transforms down the (static, 9-long) chain — unrolled at
    # trace time, fused by XLA into a handful of batched matmuls
    world_R = Rm[:, 0]
    world_t = off[:, 0]
    for i in range(1, len(chain)):
        world_t = world_t + jnp.einsum("nij,nj->ni", world_R, off[:, i])
        world_R = world_R @ Rm[:, i]
        if i == len(chain) - 2:
            wrist_R, wrist_t = world_R, world_t
    hand_t = world_t

    dir_c, normal_c, reach, head_radius = grip_arrays(grip)
    rdir = wrist_R @ dir_c
    rnormal = wrist_R @ normal_c
    wrist_world = wrist_t + root_pos
    return {
        "pos": wrist_world + rdir * reach,
        "normal": rnormal,
        "dir": rdir,
        "head_radius": head_radius,
        "wrist_pos": wrist_world,
        "hand_pos": hand_t + root_pos,
    }
