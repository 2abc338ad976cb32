"""Math-core unit tests: quaternion/rotation ops vs scipy ground truth and round-trips."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation, Slerp

import jax.numpy as jnp

from vid2player3d_tpu.core import quat as Q
from vid2player3d_tpu.core import rot as R


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def random_quats(rng, n):
    q = rng.randn(n, 4)
    return (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float32)


def test_quat_mul_vs_scipy(rng):
    a, b = random_quats(rng, 64), random_quats(rng, 64)
    got = np.asarray(Q.quat_mul(jnp.array(a), jnp.array(b)))
    want = (Rotation.from_quat(a) * Rotation.from_quat(b)).as_quat()
    # same rotation up to sign
    dot = np.abs(np.sum(got * want, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_quat_rotate_vs_scipy(rng):
    q = random_quats(rng, 64)
    v = rng.randn(64, 3).astype(np.float32)
    got = np.asarray(Q.quat_rotate(jnp.array(q), jnp.array(v)))
    want = Rotation.from_quat(q).apply(v)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_quat_rotate_inverse(rng):
    q = random_quats(rng, 32)
    v = rng.randn(32, 3).astype(np.float32)
    out = Q.quat_rotate_inverse(jnp.array(q), Q.quat_rotate(jnp.array(q), jnp.array(v)))
    np.testing.assert_allclose(np.asarray(out), v, atol=1e-4)


def test_exp_map_roundtrip(rng):
    aa = rng.uniform(-2.0, 2.0, size=(64, 3)).astype(np.float32)
    q = Q.exp_map_to_quat(jnp.array(aa))
    back = np.asarray(Q.quat_to_exp_map(q))
    np.testing.assert_allclose(back, aa, atol=1e-4)


def test_exp_map_vs_scipy(rng):
    aa = rng.uniform(-2.0, 2.0, size=(64, 3)).astype(np.float32)
    got = np.asarray(Q.exp_map_to_quat(jnp.array(aa)))
    want = Rotation.from_rotvec(aa).as_quat()
    dot = np.abs(np.sum(got * want, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_rotmat_roundtrip(rng):
    q = random_quats(rng, 128)
    m = Q.quat_to_rotmat(jnp.array(q))
    np.testing.assert_allclose(np.asarray(m), Rotation.from_quat(q).as_matrix(), atol=1e-5)
    q2 = np.asarray(Q.rotmat_to_quat(m))
    dot = np.abs(np.sum(q2 * q, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-4)


def test_rot6d_roundtrip(rng):
    q = random_quats(rng, 64)
    r6 = R.quat_to_rot6d(jnp.array(q))
    m = R.rot6d_to_rotmat(r6)
    np.testing.assert_allclose(np.asarray(m), Rotation.from_quat(q).as_matrix(), atol=1e-4)
    # rot6d layout: [col0, col1]
    mm = Rotation.from_quat(q).as_matrix()
    np.testing.assert_allclose(np.asarray(r6)[:, :3], mm[:, :, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(r6)[:, 3:], mm[:, :, 1], atol=1e-5)


def test_slerp_vs_scipy(rng):
    q0, q1 = random_quats(rng, 32), random_quats(rng, 32)
    t = 0.3
    got = np.asarray(Q.slerp(jnp.array(q0), jnp.array(q1), jnp.full((32, 1), t)))
    for i in range(32):
        s = Slerp([0, 1], Rotation.from_quat(np.stack([q0[i], q1[i]])))
        want = s(t).as_quat()
        dot = abs(np.dot(got[i], want))
        assert dot > 1 - 1e-4, (i, got[i], want)


def test_heading(rng):
    # heading = direction of rotated x-axis on xy plane
    yaw = rng.uniform(-np.pi, np.pi, 16).astype(np.float32)
    q = Rotation.from_euler("z", yaw[:, None]).as_quat().astype(np.float32)
    got = np.asarray(Q.calc_heading(jnp.array(q)))
    np.testing.assert_allclose(got, yaw, atol=1e-4)
    # heading_quat_inv applied to the rotation should zero the heading
    hq_inv = Q.calc_heading_quat_inv(jnp.array(q))
    combined = Q.quat_mul(hq_inv, jnp.array(q))
    np.testing.assert_allclose(np.asarray(Q.calc_heading(combined)), 0.0, atol=1e-4)


def test_quat_to_tan_norm(rng):
    q = random_quats(rng, 16)
    tn = np.asarray(Q.quat_to_tan_norm(jnp.array(q)))
    m = Rotation.from_quat(q).as_matrix()
    np.testing.assert_allclose(tn[:, :3], m @ np.array([1.0, 0, 0]), atol=1e-4)
    np.testing.assert_allclose(tn[:, 3:], m @ np.array([0.0, 0, 1.0]), atol=1e-4)


def test_quat_between_two_vec(rng):
    v1 = rng.randn(32, 3).astype(np.float32)
    v2 = rng.randn(32, 3).astype(np.float32)
    q = Q.quat_between_two_vec(jnp.array(v1), jnp.array(v2))
    v1n = v1 / np.linalg.norm(v1, axis=-1, keepdims=True)
    v2n = v2 / np.linalg.norm(v2, axis=-1, keepdims=True)
    got = np.asarray(Q.quat_rotate(q, jnp.array(v1n)))
    np.testing.assert_allclose(got, v2n, atol=1e-4)
    # opposite vectors
    q = Q.quat_between_two_vec(jnp.array([[1.0, 0, 0]]), jnp.array([[-1.0, 0, 0]]))
    got = np.asarray(Q.quat_rotate(q, jnp.array([[1.0, 0, 0]])))
    np.testing.assert_allclose(got, [[-1.0, 0, 0]], atol=1e-4)


def test_ypr_euler_roundtrip(rng):
    ang = rng.uniform(-1.0, 1.0, size=(32, 3)).astype(np.float32)
    q = R.quat_from_ypr_euler(jnp.array(ang))
    back = np.asarray(R.ypr_euler_from_quat(q))
    np.testing.assert_allclose(back, ang, atol=1e-4)


def test_angle_axis_rotmat_roundtrip(rng):
    aa = rng.uniform(-2, 2, size=(32, 3)).astype(np.float32)
    m = R.angle_axis_to_rotmat(jnp.array(aa))
    np.testing.assert_allclose(np.asarray(m), Rotation.from_rotvec(aa).as_matrix(), atol=1e-4)
    back = np.asarray(R.rotmat_to_angle_axis(m))
    np.testing.assert_allclose(back, aa, atol=1e-3)


def test_normalize_angle():
    a = jnp.array([0.0, np.pi + 0.1, -np.pi - 0.1, 2 * np.pi, 7.0])
    got = np.asarray(Q.normalize_angle(a))
    want = np.arctan2(np.sin(np.asarray(a)), np.cos(np.asarray(a)))
    np.testing.assert_allclose(got, want, atol=1e-6)
