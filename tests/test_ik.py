"""Twist-swing IK: FK→IK position round-trips, rotation validity, wrappers."""

import numpy as np
import jax
import jax.numpy as jnp

from vid2player3d_tpu.core import ik as IK
from vid2player3d_tpu.core import rot as R
from vid2player3d_tpu.core.smpl import (SMPL_PARENTS, batch_rigid_transform,
                                        make_synthetic_smpl, rest_joints)


def _rest_pose(B):
    model = make_synthetic_smpl()
    rest = rest_joints(model, jnp.zeros((B, 10)))
    return rest.astype(jnp.float32)


def _random_pose_targets(B, seed=0, scale=0.4):
    """FK a random (moderate) pose; return targets + rest."""
    rng = np.random.RandomState(seed)
    rest = _rest_pose(B)
    aa = rng.uniform(-scale, scale, size=(B, 24, 3)).astype(np.float32)
    rot = R.angle_axis_to_rotmat(jnp.asarray(aa))
    posed, _ = batch_rigid_transform(rot, rest)
    return np.asarray(posed), rest


def test_ik_reconstructs_positions():
    B = 4
    targets, rest = _random_pose_targets(B, seed=1)
    phis = jnp.broadcast_to(jnp.array([1.0, 0.0]), (B, 23, 2))
    local, chain, joints = IK.batch_inverse_kinematics(
        jnp.asarray(targets), phis, rest)
    # IK is root-anchored at the rest root
    expect = targets - targets[:, 0:1] + np.asarray(rest[:, 0:1])
    err = np.linalg.norm(np.asarray(joints) - expect, axis=-1)
    # spine children (12,13,14) are a least-squares SVD fit; others exact
    exact = [j for j in range(24) if j not in (12, 13, 14)]
    assert err[:, exact].max() < 2e-3, err.max(0)
    assert err.max() < 5e-2, err.max(0)


def test_ik_rotations_are_valid():
    B = 3
    targets, rest = _random_pose_targets(B, seed=2)
    phis = jnp.broadcast_to(jnp.array([1.0, 0.0]), (B, 23, 2))
    local, chain, _ = IK.batch_inverse_kinematics(
        jnp.asarray(targets), phis, rest)
    for M in (np.asarray(local), np.asarray(chain)):
        MMt = M @ np.swapaxes(M, -1, -2)
        np.testing.assert_allclose(MMt, np.broadcast_to(np.eye(3), MMt.shape),
                                   atol=1e-4)
        np.testing.assert_allclose(np.linalg.det(M), 1.0, atol=1e-4)


def test_ik_identity_pose_gives_identity():
    B = 2
    rest = _rest_pose(B)
    phis = jnp.broadcast_to(jnp.array([1.0, 0.0]), (B, 23, 2))
    local, chain, joints = IK.batch_inverse_kinematics(rest, phis, rest)
    np.testing.assert_allclose(np.asarray(local),
                               np.broadcast_to(np.eye(3), (B, 24, 3, 3)),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(joints), np.asarray(rest), atol=1e-5)


def test_ik_jit_and_naive_variant():
    B = 2
    targets, rest = _random_pose_targets(B, seed=3)
    phis = jnp.broadcast_to(jnp.array([1.0, 0.0]), (B, 23, 2))
    f = jax.jit(IK.batch_inverse_kinematics)
    local, chain, joints = f(jnp.asarray(targets), phis, rest)
    assert np.isfinite(np.asarray(local)).all()
    ln, cn = IK.batch_inverse_kinematics_naive(jnp.asarray(targets), phis, rest)
    assert ln.shape == (B, 24, 3, 3) and cn.shape == (B, 24, 3, 3)
    assert np.isfinite(np.asarray(ln)).all()


def test_perform_context_ik_residual_params():
    B = 2
    targets, rest = _random_pose_targets(B, seed=4)
    key = jax.random.PRNGKey(0)
    phis = 0.1 * jax.random.normal(key, (B, 46))
    leaf = 0.1 * jax.random.normal(key, (B, 30))
    local, chain, joints = IK.perform_context_ik(
        jnp.asarray(targets), rest, phis=phis, leaf_rot6d=leaf)
    assert local.shape == (B, 24, 3, 3)
    assert joints.shape == (B, 24, 3)
    # re-rooting: returned joints live at the *target* root, not the rest root
    np.testing.assert_allclose(np.asarray(joints[:, 0]), targets[:, 0],
                               atol=1e-5)
