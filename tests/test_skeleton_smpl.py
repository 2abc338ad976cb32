"""FK / skeleton / SMPL LBS consistency tests."""

import numpy as np
import jax.numpy as jnp

from vid2player3d_tpu.core import quat as Q
from vid2player3d_tpu.core import smpl as S
from vid2player3d_tpu.core.skeleton import (
    SkeletonTree, fk_local_to_global, global_to_local_rot, SkeletonMotion)


def chain_tree():
    # 3-joint chain along +x
    return SkeletonTree(
        ("a", "b", "c"),
        np.array([-1, 0, 1], dtype=np.int32),
        jnp.array([[0.0, 0, 0], [1.0, 0, 0], [1.0, 0, 0]]),
    )


def test_fk_identity():
    tree = chain_tree()
    lr = jnp.tile(jnp.array([0.0, 0, 0, 1.0]), (1, 3, 1))
    root_t = jnp.array([[0.5, 0, 0]])
    g_rot, g_pos = fk_local_to_global(tree, lr, root_t)
    np.testing.assert_allclose(np.asarray(g_pos[0]),
                               [[0.5, 0, 0], [1.5, 0, 0], [2.5, 0, 0]], atol=1e-6)


def test_fk_rotation():
    tree = chain_tree()
    # rotate root 90deg about z: chain goes along +y
    q_z90 = Q.quat_from_angle_axis(jnp.array([np.pi / 2]), jnp.array([[0.0, 0, 1]]))
    lr = jnp.stack([q_z90[0], jnp.array([0.0, 0, 0, 1.0]), jnp.array([0.0, 0, 0, 1.0])])[None]
    g_rot, g_pos = fk_local_to_global(tree, lr, jnp.zeros((1, 3)))
    np.testing.assert_allclose(np.asarray(g_pos[0]),
                               [[0, 0, 0], [0, 1, 0], [0, 2, 0]], atol=1e-5)


def test_local_global_roundtrip():
    rng = np.random.RandomState(1)
    tree = chain_tree()
    lr = rng.randn(4, 3, 4).astype(np.float32)
    lr /= np.linalg.norm(lr, axis=-1, keepdims=True)
    g_rot, _ = fk_local_to_global(tree, jnp.array(lr), jnp.zeros((4, 3)))
    back = np.asarray(global_to_local_rot(tree, g_rot))
    dot = np.abs(np.sum(back * lr, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-4)


def test_skeleton_motion_velocity():
    tree = chain_tree()
    T = 20
    lr = np.tile(np.array([0.0, 0, 0, 1.0], dtype=np.float32), (T, 3, 1))
    root_t = np.zeros((T, 3), dtype=np.float32)
    root_t[:, 0] = np.arange(T) * 0.1  # 0.1 m/frame at 30fps = 3 m/s
    m = SkeletonMotion(tree=tree, local_rotation=lr, root_translation=root_t, fps=30)
    v = m.global_root_velocity
    np.testing.assert_allclose(v[5:-5, 0], 3.0, atol=1e-3)
    assert m.global_angular_velocity.shape == (T, 3, 3)


def test_smpl_rest_and_lbs():
    model = S.make_synthetic_smpl()
    betas = jnp.zeros((2, 10))
    J = S.rest_joints(model, betas)
    assert J.shape == (2, 24, 3)

    # zero pose LBS returns shaped template
    pose = jnp.zeros((2, 72))
    verts, joints = S.lbs(model, betas, pose)
    np.testing.assert_allclose(np.asarray(verts),
                               np.asarray(S.shaped_vertices(model, betas)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(joints), np.asarray(J), atol=1e-5)

    # betas change the body
    J2 = S.rest_joints(model, jnp.ones((1, 10)) * 2.0)
    assert np.abs(np.asarray(J2) - np.asarray(J[:1])).max() > 1e-4


def test_batch_rigid_transform_rotation_propagates():
    model = S.make_synthetic_smpl()
    J = S.rest_joints(model, jnp.zeros((1, 10)))
    pose = np.zeros((1, 72), dtype=np.float32)
    # rotate L_Shoulder (idx 16) by 90 deg about z → L_Wrist moves
    pose[0, 16 * 3 + 2] = np.pi / 2
    _, joints = S.lbs(model, jnp.zeros((1, 10)), jnp.array(pose))
    wrist_rest = np.asarray(J)[0, 20]
    wrist_posed = np.asarray(joints)[0, 20]
    assert np.abs(wrist_posed - wrist_rest).max() > 0.1
    # pelvis stays
    np.testing.assert_allclose(np.asarray(joints)[0, 0], np.asarray(J)[0, 0], atol=1e-5)


def test_smpl_mujoco_mapping_roundtrip():
    x = np.arange(24)
    assert (x[S.SMPL_2_MUJOCO][S.MUJOCO_2_SMPL] == x).all()
