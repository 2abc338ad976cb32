"""Dual-player rally env: lane pairing, hand-off mirroring, done coupling."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vid2player3d_tpu.envs import DualTennisEnv, TennisConfig
from vid2player3d_tpu.learn import V2PPPO
from vid2player3d_tpu.learn.v2p_ppo import V2PConfig
from vid2player3d_tpu.tennis import player as P
from vid2player3d_tpu.tennis.ball import TennisBallGenerator


@pytest.fixture(scope="module")
def env():
    key = jax.random.PRNGKey(0)
    spec = P.make_random_spec(key, hidden=32, experts=2)
    rng = np.random.default_rng(0)
    feats = (rng.standard_normal((8, P.FRAME_SIZE)) * 0.05).astype(np.float32)
    feats[:, 2] = 0.95
    cfg = TennisConfig(num_envs=4, substeps=2, max_episode_length=50,
                       reset_reaction_nframes=12)
    gen = TennisBallGenerator(num_candidates=256, seed=0)
    return DualTennisEnv(cfg, spec, feats, ball_generator=gen)


def test_reset_lane_roles(env):
    state, obs = env.reset_all(jax.random.PRNGKey(1))
    ta = np.asarray(state.tar_action)
    # even lanes receive first; odd lanes (servers) wait for the hand-off
    assert list(ta) == [1, 0, 1, 0]
    # the rally opens with the odd lane's synthesized serve
    # (`humanoid_smpl_im_mvae_dual.py:52-63`): servers' ball launches from
    # their racket at serve speed; receivers get the mirrored incoming ball
    bp = np.asarray(state.ball_pos)
    bv = np.asarray(state.ball_vel)
    rp = np.asarray(state.racket_pos)
    assert np.allclose(bp[1::2], rp[1::2], atol=1e-5)   # serve from racket
    assert np.all(bv[1::2, 1] >= 28.0)                  # outgoing serve speed
    assert np.all(bp[0::2, 1] > 0)                      # incoming from far side
    assert np.all(bv[0::2, 1] <= -28.0)
    assert np.all(np.isfinite(np.asarray(obs)))


@pytest.mark.slow
def test_done_coupled_across_lanes(env):
    state, _ = env.reset_all(jax.random.PRNGKey(2))
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(3)
    for _ in range(25):
        key, sub = jax.random.split(key)
        act = 0.1 * jax.random.normal(sub, (4, env.num_actions))
        state, out = step(state, act)
        d = np.asarray(out.done)
        # rally ends for both paired lanes together
        assert np.array_equal(d[0::2], d[1::2])
        assert np.all(np.isfinite(np.asarray(out.obs)))


@pytest.mark.slow
def test_handoff_mirrors_partner_ball(env):
    """A hit on lane 0 hands lane 1 the mirrored incoming ball."""
    state, _ = env.reset_all(jax.random.PRNGKey(4))
    N = 4
    # place lane-0 balls right on the racket, incoming, to force contact
    pos = np.asarray(state.racket_pos).copy()
    pos[:, 1] += 0.03
    vel = np.tile(np.array([0.0, -20.0, 2.0], np.float32), (N, 1))
    state = dataclasses.replace(
        state,
        ball_pos=jnp.asarray(pos), ball_vel=jnp.asarray(vel),
        ball_vspin=jnp.zeros(N),
        has_contact=jnp.zeros(N, bool),
        # keep episodes alive regardless of estimate outcome
        progress=jnp.zeros(N, jnp.int32))
    env2 = DualTennisEnv.__new__(DualTennisEnv)
    env2.__dict__.update(env.__dict__)
    env2.cfg = dataclasses.replace(env.cfg, enable_early_termination=False)
    state, out = jax.jit(env2.step)(state, jnp.zeros((N, env.num_actions)))
    hit = np.asarray(state.has_contact)[0::2]
    if hit.any():
        ta = np.asarray(state.tar_action)
        done = np.asarray(out.done, bool)
        for i in np.nonzero(hit)[0]:
            even, odd = 2 * i, 2 * i + 1
            if done[even]:
                continue
            # partner flipped into reaction with a mirrored incoming ball
            assert ta[odd] == 1
            b_even = np.asarray(state.ball_pos)[even]
            b_odd = np.asarray(state.ball_pos)[odd]
            assert np.allclose(b_odd[:2], -b_even[:2], atol=2.0)
            assert np.asarray(state.ball_vel)[odd, 1] <= 0.0


@pytest.mark.slow
def test_dual_policy_routing_trains():
    """V2PPPO(num_policies=2) runs one epoch and keeps two distinct nets."""
    key = jax.random.PRNGKey(0)
    spec = P.make_random_spec(key, hidden=32, experts=2)
    rng = np.random.default_rng(0)
    feats = (rng.standard_normal((8, P.FRAME_SIZE)) * 0.05).astype(np.float32)
    feats[:, 2] = 0.95
    cfg = TennisConfig(num_envs=4, substeps=2, max_episode_length=50)
    env = DualTennisEnv(cfg, spec, feats,
                        ball_generator=TennisBallGenerator(
                            num_candidates=256, seed=0))
    agent = V2PPPO(env, V2PConfig(horizon=4, minibatch_size=8,
                                  mini_epochs=1, num_policies=2,
                                  actor_units=(32,), critic_units=(32,)),
                   seed=1)
    ts = agent.init_state()
    old0 = np.asarray(jax.tree_util.tree_leaves(ts.params)[0]).copy()
    ts2, metrics = agent.train_epoch(ts)
    assert np.isfinite(float(metrics["reward_mean"]))
    # the stacked params differ per lane and both received updates
    leaf0 = jax.tree_util.tree_leaves(ts2.params)[0]
    assert leaf0.shape[0] == 2
    assert not np.allclose(np.asarray(leaf0[0]), np.asarray(leaf0[1]))
    assert not np.allclose(np.asarray(leaf0), old0)


def test_dual_per_player_identity():
    """Dual rallies run TWO distinct player identities: per-lane MVAE spec,
    handedness (grips/wrist), two-hand flag, and per-lane frozen low-level
    nets (`mvae_player.py:33-40`, `im_player.py:54-90`,
    `federer_djokovic.yaml:65`)."""
    key = jax.random.PRNGKey(5)
    spec_a = P.make_random_spec(key, player="federer", hidden=32, experts=2)
    spec_b = dataclasses.replace(
        P.make_random_spec(jax.random.fold_in(key, 1), player="nadal",
                           hidden=32, experts=2),
        righthand=False)
    rng = np.random.default_rng(0)
    fa = (rng.standard_normal((8, P.FRAME_SIZE)) * 0.05).astype(np.float32)
    fb = (rng.standard_normal((8, P.FRAME_SIZE)) * 0.05).astype(np.float32)
    fa[:, 2] = fb[:, 2] = 0.95
    cfg = TennisConfig(num_envs=4, substeps=2, max_episode_length=50,
                       reset_reaction_nframes=12, two_hand_iters=2)
    gen = TennisBallGenerator(num_candidates=256, seed=0)

    # distinct per-lane pi_low stubs: lane B pushes a recognizable constant
    def pi_a(params, obs):
        return jnp.zeros((obs.shape[0], 69))

    def pi_b(params, obs):
        return jnp.full((obs.shape[0], 69), 0.01)

    env = DualTennisEnv(cfg, (spec_a, spec_b), (fa, fb),
                        ball_generator=gen,
                        pi_low=pi_a, pi_low_params=None,
                        pi_low_b=pi_b, pi_low_params_b=None,
                        two_hand_lanes=(False, True))
    # per-lane handedness plumbing
    from vid2player3d_tpu.core.smpl import MUJOCO_JOINT_NAMES as MJ
    wid = np.asarray(env.wrist_id)
    assert wid[0] == MJ.index("R_Wrist") and wid[2] == MJ.index("R_Wrist")
    assert wid[1] == MJ.index("L_Wrist") and wid[3] == MJ.index("L_Wrist")
    assert list(np.asarray(env.two_hand_mask)) == [False, True, False, True]
    assert env.any_two_hand
    # grip frames mirrored for the left-handed lane
    rd = np.asarray(env.racket_dir_c)
    assert rd[0, 0] == -1.0 and rd[1, 0] == 1.0
    # racket mass welded into each lane's OWN wrist (delta vs unwelded —
    # the synthetic body's base masses are asymmetric)
    env_nw = DualTennisEnv(
        dataclasses.replace(cfg, simulated_racket_mass=False),
        (spec_a, spec_b), (fa, fb), ball_generator=gen,
        pi_low=pi_a, pi_low_params=None, pi_low_b=pi_b,
        pi_low_params_b=None, two_hand_lanes=(False, True))
    dm = np.asarray(env.model.body_mass) - np.asarray(env_nw.model.body_mass)
    assert abs(dm[0, MJ.index("R_Wrist")] - 0.591) < 1e-3
    assert abs(dm[0, MJ.index("L_Wrist")]) < 1e-6
    assert abs(dm[1, MJ.index("L_Wrist")] - 0.591) < 1e-3
    assert abs(dm[1, MJ.index("R_Wrist")]) < 1e-6

    state, obs = env.reset_all(jax.random.PRNGKey(7))
    assert np.isfinite(np.asarray(obs)).all()
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(8)
    for _ in range(6):
        key, sub = jax.random.split(key)
        act = 0.1 * jax.random.normal(sub, (4, env.num_actions))
        state, out = step(state, act)
        assert np.isfinite(np.asarray(out.obs)).all()
