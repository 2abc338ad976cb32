"""MotionLib: sampling, blended state lookup, save/load, merge."""

import numpy as np
import jax
import jax.numpy as jnp

from vid2player3d_tpu.core import smpl as S
from vid2player3d_tpu.data import motion_lib as ML
from vid2player3d_tpu.data.synthetic import make_synthetic_motion_lib


def _lib():
    return make_synthetic_motion_lib(num_motions=3, T=60, fps=30.0, seed=0)


def test_build_shapes():
    lib = _lib()
    assert lib.num_motions == 3
    assert lib.num_bodies == 24
    assert lib.num_dof == 69
    assert lib.gts.shape[0] == 180
    np.testing.assert_allclose(float(lib.motion_weights.sum()), 1.0, rtol=1e-5)


def test_sampling():
    lib = _lib()
    key = jax.random.PRNGKey(0)
    ids = ML.sample_motions(lib, key, 256)
    assert ids.shape == (256,)
    assert (np.asarray(ids) >= 0).all() and (np.asarray(ids) < 3).all()
    times = ML.sample_time(lib, key, ids, truncate_time=0.5)
    lens = np.asarray(lib.motion_lengths)[np.asarray(ids)]
    assert (np.asarray(times) <= lens - 0.5 + 1e-5).all()
    assert (np.asarray(times) >= 0).all()


def test_get_motion_state_endpoints():
    lib = _lib()
    ids = jnp.array([0, 1, 2])
    # t=0 → exactly frame 0
    st = ML.get_motion_state(lib, ids, jnp.zeros(3), adjust_height=False)
    starts = np.asarray(lib.length_starts)
    np.testing.assert_allclose(np.asarray(st["root_pos"]),
                               np.asarray(lib.gts)[starts, 0], atol=1e-5)
    # rotations equal up to sign (slerp normalizes)
    dot = np.abs(np.sum(np.asarray(st["rb_rot"]) * np.asarray(lib.grs)[starts], axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-4)
    # dof_pos round-trips through exp map of local rotation
    from vid2player3d_tpu.core import quat as Q
    lr0 = np.asarray(lib.lrs)[starts]  # (3, 24, 4)
    want = np.asarray(Q.quat_to_exp_map(jnp.asarray(lr0[:, 1:]))).reshape(3, -1)
    np.testing.assert_allclose(np.asarray(st["dof_pos"]), want, atol=1e-4)


def test_get_motion_state_blend_midpoint():
    lib = _lib()
    ids = jnp.array([0])
    dt = float(lib.motion_dt[0])
    t = jnp.array([1.5 * dt])  # halfway between frames 1 and 2
    st = ML.get_motion_state(lib, ids, t, adjust_height=False)
    g = np.asarray(lib.gts)
    want = 0.5 * (g[1, 0] + g[2, 0])
    np.testing.assert_allclose(np.asarray(st["root_pos"][0]), want, atol=1e-5)


def test_adjust_height():
    lib = _lib()
    ids = jnp.array([0])
    t = jnp.zeros(1)
    st0 = ML.get_motion_state(lib, ids, t, adjust_height=False)
    st1 = ML.get_motion_state(lib, ids, t, adjust_height=True)
    dh = float(lib.motion_min_verts_h[0])
    np.testing.assert_allclose(
        np.asarray(st0["root_pos"][0, 2]) - np.asarray(st1["root_pos"][0, 2]),
        dh, atol=1e-5)


def test_save_load_merge(tmp_path):
    lib = _lib()
    p = str(tmp_path / "lib.npz")
    lib.save(p)
    lib2 = ML.MotionLib.load(p)
    np.testing.assert_allclose(np.asarray(lib.gts), np.asarray(lib2.gts))

    merged = ML.MotionLib.merge([lib, lib2])
    assert merged.num_motions == 6
    np.testing.assert_allclose(float(merged.motion_weights.sum()), 1.0, rtol=1e-5)
    # second copy's frames start after the first's
    st_a = ML.get_motion_state(lib, jnp.array([1]), jnp.array([0.3]))
    st_b = ML.get_motion_state(merged, jnp.array([4]), jnp.array([0.3]))
    np.testing.assert_allclose(np.asarray(st_a["rb_pos"]), np.asarray(st_b["rb_pos"]), atol=1e-5)


def test_lookup_jit_and_vmapped_scale():
    lib = _lib()

    @jax.jit
    def get(ids, t):
        return ML.get_motion_state(lib, ids, t)

    ids = jnp.zeros(512, dtype=jnp.int32)
    t = jnp.linspace(0, 1.5, 512)
    out = get(ids, t)
    assert out["rb_pos"].shape == (512, 24, 3)
    assert np.isfinite(np.asarray(out["rb_pos"])).all()
