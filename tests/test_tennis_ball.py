"""Tennis ball flight, trajectory pools, estimators, racket geometry."""

import jax
import jax.numpy as jnp
import numpy as np

from vid2player3d_tpu.tennis import (TennisBallGenerator, aero_force, court,
                                     estimate_in, estimate_out,
                                     racket_from_wrist, racket_with_fk,
                                     simulate_flight)
from vid2player3d_tpu.tennis.ball import spin_vector


def test_aero_force_directions():
    vel = jnp.array([[0.0, 20.0, 0.0]])
    f_top = aero_force(vel, jnp.array([8.0]))
    f_back = aero_force(vel, jnp.array([-8.0]))
    # drag opposes motion
    assert f_top[0, 1] < 0 and f_back[0, 1] < 0
    # topspin Magnus pushes down, backspin up
    assert f_top[0, 2] < 0 < f_back[0, 2]


def test_flight_bounces_and_passes_net():
    # serve-like launch from the opponent baseline toward this player
    pos = jnp.array([[0.0, 12.0, 1.2]])
    th = np.deg2rad(10.0)
    vel = jnp.array([[0.0, -28.0 * np.cos(th), 28.0 * np.sin(th)]])
    res = simulate_flight(pos, vel, jnp.array([7.0]), num_frames=100)
    assert bool(res.has_bounce[0]) and bool(res.pass_net[0])
    bp = np.asarray(res.bounce_pos[0])
    assert -11.0 < bp[1] < 0.0  # lands in this player's half
    assert np.all(np.isfinite(np.asarray(res.traj)))
    # topspin shortens flight vs backspin
    res_back = simulate_flight(pos, vel, jnp.array([-7.0]), num_frames=100)
    assert res.bounce_time[0] < res_back.bounce_time[0]


def test_flight_into_net_detected():
    pos = jnp.array([[0.0, 12.0, 0.5]])
    vel = jnp.array([[0.0, -12.0, -1.0]])  # weak, low: into the ground/net
    res = simulate_flight(pos, vel, jnp.array([0.5]), num_frames=100)
    assert not bool(res.pass_net[0])


def test_generator_pool_and_sampling():
    gen = TennisBallGenerator(num_candidates=512, seed=0)
    assert gen.pool_size > 50  # most candidates should be valid
    traj, lp, lv, ls = gen.sample(jax.random.PRNGKey(1), 16)
    assert traj.shape == (16, gen.traj_length, 3)
    assert lp.shape == (16, 3) and lv.shape == (16, 3) and ls.shape == (16,)
    # pooled trajectories all start on the opponent side and land here
    assert np.all(np.asarray(lp[:, 1]) > 0)


def _pack_state(pos, vel, vspin):
    pos, vel = jnp.asarray(pos)[None], jnp.asarray(vel)[None]
    quat = jnp.array([[0.0, 0.0, 0.0, 1.0]])
    ang = spin_vector(vel, jnp.array([vspin]))
    return jnp.concatenate([pos, quat, vel, ang], axis=-1)


def test_estimate_out_good_and_net():
    good = _pack_state([0.0, 11.0, 1.0], [1.0, -26.0, 5.5], 6.0)
    valid, bounce, btime, maxh = estimate_out(good)
    assert bool(valid[0]) and btime[0] > 0
    assert bounce[0, 1] < 0  # bounces in the far half
    # flat weak shot dies at the net -> bounce zeroed
    netted = _pack_state([0.0, 11.0, 0.6], [0.0, -12.0, -0.5], 0.5)
    valid2, bounce2, btime2, _ = estimate_out(netted)
    assert float(jnp.abs(bounce2).sum()) == 0.0 and float(btime2[0]) == 0.0


def test_estimate_in_mirrors_state():
    out = _pack_state([2.0, 10.0, 1.1], [-1.0, -27.0, 4.0], 7.0)
    traj, st_in, st_out = estimate_in(out)
    assert traj.shape == (1, 100, 3)
    np.testing.assert_allclose(np.asarray(st_in[0, :2]),
                               -np.asarray(out[0, :2]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(st_in[0, 7:9]),
                               -np.asarray(out[0, 7:9]), atol=1e-5)
    # incoming trajectory starts on the mirrored side, heads into y>0... the
    # mirrored launch heads toward this player's court
    assert float(traj[0, 0, 1]) < 0 and float(traj[0, -1, 1]) > float(
        traj[0, 0, 1])


def test_racket_from_wrist_identity():
    pos = jnp.zeros((2, 3))
    rot = jnp.tile(jnp.eye(3), (2, 1, 1))
    head, normal = racket_from_wrist(pos, rot, "eastern")
    np.testing.assert_allclose(np.asarray(head[0]), [-0.5, 0.0, 0.0],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(normal[0]), [0.0, 1.0, 0.0],
                               atol=1e-6)


def test_racket_with_fk_chain():
    N, J = 3, 24
    rotmat = jnp.tile(jnp.eye(3), (N, J, 1, 1))
    bind = jnp.ones((N, J, 3)) * 0.1
    root = jnp.zeros((N, 3))
    out = racket_with_fk(rotmat, bind, root, "eastern")
    # identity rotations: wrist = sum of 8 chain offsets
    np.testing.assert_allclose(np.asarray(out["wrist_pos"][0]),
                               [0.8, 0.8, 0.8], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["hand_pos"][0]),
                               [0.9, 0.9, 0.9], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["pos"][0]), [0.8 - 0.5, 0.8, 0.8], atol=1e-5)
    # rotating the wrist 90deg about z swings the racket dir from -x to -y
    from vid2player3d_tpu.core import quat as Q
    q = Q.quat_from_angle_axis(jnp.array(np.pi / 2),
                               jnp.array([0.0, 0.0, 1.0]))
    Rz = Q.quat_to_rotmat(q)
    rotmat2 = rotmat.at[:, 21].set(Rz)  # RWrist
    out2 = racket_with_fk(rotmat2, bind, root, "eastern")
    np.testing.assert_allclose(np.asarray(out2["dir"][0]), [0.0, -1.0, 0.0],
                               atol=1e-5)
