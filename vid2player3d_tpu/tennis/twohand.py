"""Two-hand-backhand IK post-optimization.

TPU-native re-design of the reference's offline Adam loop
(`vid2player/env/tasks/humanoid_smpl_im_mvae.py:948-1031
optimize_two_hand_backhand`): the free (non-racket) arm's
collar/shoulder/elbow/wrist rotations are adjusted so the free hand grips the
racket handle — the point mirrored one hand-length beyond the racket hand,
`target = 2·hand − wrist − pelvis` (`:961-962`).

Instead of a host-side torch optimizer with tqdm, this is a fixed-iteration
Adam loop on angle-axis deltas inside `lax.fori_loop` — fully jittable and
vmapped over the batch, so it can run per-frame inside the fused step or over
whole clips at once. Losses mirror the reference: L1 to target + L1
regularization on the deltas (batch mode weights, `:975-980`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import rot as R
from ..core.smpl import SMPL_BONE_ORDER_NAMES, batch_rigid_transform

_IDX = {n: i for i, n in enumerate(SMPL_BONE_ORDER_NAMES)}

# free-arm IK chains (reference ik_joint_smpl, `:965-969`)
_IK_RIGHT = (_IDX["L_Wrist"], _IDX["L_Elbow"], _IDX["L_Shoulder"],
             _IDX["L_Thorax"])
_IK_LEFT = (_IDX["R_Wrist"], _IDX["R_Elbow"], _IDX["R_Shoulder"],
            _IDX["R_Thorax"])


def two_hand_target(posed_joints, righthand: bool = True):
    """Handle-grip target for the free hand (`:961-962`)."""
    if righthand:
        h, w = _IDX["R_Hand"], _IDX["R_Wrist"]
    else:
        h, w = _IDX["L_Hand"], _IDX["L_Wrist"]
    return (2.0 * posed_joints[:, h] - posed_joints[:, w]
            - posed_joints[:, 0])


def optimize_two_hand_backhand(joint_rotmat, rest_smpl, righthand: bool = True,
                               iters: int = 50, lr: float = 0.05,
                               w_reg: float = 0.1, mask=None):
    """Adjust the free arm so both hands hold the racket.

    joint_rotmat: (N, 24, 3, 3) SMPL-order local rotations.
    rest_smpl: (N, 24, 3) SMPL-order rest joint positions.
    mask: optional (N,) bool — rows where the fix applies (e.g. backhand
      swing frames); other rows pass through unchanged.

    Returns the adjusted (N, 24, 3, 3) rotations.
    """
    ik = jnp.asarray(_IK_RIGHT if righthand else _IK_LEFT)
    fh = _IDX["L_Hand"] if righthand else _IDX["R_Hand"]
    N = joint_rotmat.shape[0]

    posed0, _ = batch_rigid_transform(joint_rotmat, rest_smpl)
    target = two_hand_target(posed0, righthand)

    aa0 = R.rotmat_to_angle_axis(
        joint_rotmat[:, ik].reshape(-1, 3, 3)).reshape(N, 4, 3)

    def loss_fn(delta):
        aa = aa0 + delta
        rm = joint_rotmat.at[:, ik].set(
            R.angle_axis_to_rotmat(aa.reshape(-1, 3)).reshape(N, 4, 3, 3))
        posed, _ = batch_rigid_transform(rm, rest_smpl)
        # reference compares the free-hand pos against 2h − w − pelvis with
        # the pelvis folded into the target (`:961, :1012`)
        l_target = jnp.abs(posed[:, fh] - target).mean()
        l_reg = jnp.abs(delta).mean()
        return l_target + w_reg * l_reg

    grad_fn = jax.grad(loss_fn)

    # inline Adam (betas 0.9/0.999, `:995`) under fori_loop
    def body(i, carry):
        delta, m, v = carry
        g = grad_fn(delta)
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        mh = m / (1.0 - 0.9 ** (i + 1.0))
        vh = v / (1.0 - 0.999 ** (i + 1.0))
        delta = delta - lr * mh / (jnp.sqrt(vh) + 1e-8)
        return delta, m, v

    z = jnp.zeros_like(aa0)
    delta, _, _ = jax.lax.fori_loop(0, iters, body, (z, z, z))

    aa = aa0 + delta
    new_rm = joint_rotmat.at[:, ik].set(
        R.angle_axis_to_rotmat(aa.reshape(-1, 3)).reshape(N, 4, 3, 3))
    if mask is not None:
        new_rm = jnp.where(mask[:, None, None, None], new_rm, joint_rotmat)
    return new_rm
