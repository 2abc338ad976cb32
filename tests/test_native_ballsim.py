"""Native C++ ball simulator vs the JAX integrator: same force model."""

import numpy as np
import pytest

from vid2player3d_tpu.native import build_library, native_available, \
    simulate_flight_native
from vid2player3d_tpu.tennis.ball import (DEFAULT_PARAMS,
                                          TennisBallGenerator,
                                          simulate_flight)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no C++ toolchain")


def _launches(n=64, seed=0):
    rng = np.random.default_rng(seed)
    pos = np.stack([rng.uniform(-4, 4, n), rng.uniform(11, 13, n),
                    rng.uniform(1.0, 1.6, n)], 1).astype(np.float32)
    speed = rng.uniform(25, 32, n)
    theta = np.deg2rad(rng.uniform(4, 16, n))
    d = -pos[:, :2] / np.linalg.norm(pos[:, :2], axis=1, keepdims=True)
    vel = np.stack([speed * np.cos(theta) * d[:, 0],
                    speed * np.cos(theta) * d[:, 1],
                    speed * np.sin(theta)], 1).astype(np.float32)
    vspin = rng.uniform(3, 10, n).astype(np.float32)
    return pos, vel, vspin


def test_build_is_cached(tmp_path):
    lib1 = build_library()
    lib2 = build_library()
    assert lib1 == lib2


def test_native_matches_jax_integrator():
    pos, vel, vspin = _launches()
    nat = simulate_flight_native(pos, vel, vspin, num_frames=80)
    ref = simulate_flight(pos, vel, vspin, num_frames=80, p=DEFAULT_PARAMS)
    traj_ref = np.asarray(ref.traj)
    # trajectories agree to float accumulation order over 80 frames
    err = np.abs(nat.traj - traj_ref).max()
    assert err < 2e-2, f"max traj deviation {err}"
    assert np.array_equal(nat.has_bounce, np.asarray(ref.has_bounce))
    assert np.mean(nat.pass_net == np.asarray(ref.pass_net)) > 0.95
    hb = nat.has_bounce
    assert np.allclose(nat.bounce_pos[hb], np.asarray(ref.bounce_pos)[hb],
                       atol=5e-2)
    assert np.allclose(nat.bounce_time[hb], np.asarray(ref.bounce_time)[hb],
                       atol=2.0 / 30.0)


def test_generator_native_backend_pools_agree():
    g_jax = TennisBallGenerator(num_candidates=512, seed=3, backend="jax")
    g_nat = TennisBallGenerator(num_candidates=512, seed=3, backend="native")
    assert g_nat.backend == "native"
    # same candidate sampling + same physics -> (nearly) the same pool
    assert abs(g_nat.pool_size - g_jax.pool_size) <= 0.05 * g_jax.pool_size
    # launch states are drawn identically, so survivors common to both
    # backends must carry identical launch velocities: match rows of the
    # (smaller) pool against the other pool by nearest launch position
    jax_lp = np.asarray(g_jax.launch_pos)
    nat_lp = np.asarray(g_nat.launch_pos)
    jax_lv = np.asarray(g_jax.launch_vel)
    nat_lv = np.asarray(g_nat.launch_vel)
    matched = 0
    for i in range(min(g_nat.pool_size, 64)):
        d = np.linalg.norm(jax_lp - nat_lp[i], axis=1)
        j = int(np.argmin(d))
        if d[j] < 1e-5:  # same candidate survived in both backends
            np.testing.assert_allclose(nat_lv[i], jax_lv[j], atol=1e-4)
            matched += 1
    # the overwhelming majority of candidates must be common survivors
    assert matched >= 0.9 * min(g_nat.pool_size, 64)
