"""Fused hierarchical tennis env: step semantics, task machine, rewards."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vid2player3d_tpu.envs import TennisConfig, TennisEnv
from vid2player3d_tpu.tennis import player as P
from vid2player3d_tpu.tennis.ball import TennisBallGenerator


@pytest.fixture(scope="module")
def env():
    key = jax.random.PRNGKey(0)
    spec = P.make_random_spec(key, hidden=32, experts=2)
    # init condition pool: small raw feature rows with a plausible root
    rng = np.random.default_rng(0)
    feats = (rng.standard_normal((8, P.FRAME_SIZE)) * 0.05).astype(np.float32)
    feats[:, 2] = 0.95  # root height
    cfg = TennisConfig(num_envs=4, substeps=2, max_episode_length=50,
                       reset_reaction_nframes=12)
    gen = TennisBallGenerator(num_candidates=256, seed=0)
    return TennisEnv(cfg, spec, feats, ball_generator=gen)


def test_reset_shapes(env):
    state, obs = env.reset_all(jax.random.PRNGKey(1))
    assert obs.shape == (4, env.obs_dim)
    assert env.obs_dim == 225 + 3 * env.cfg.obs_ball_traj_length + 2
    assert np.all(np.isfinite(np.asarray(obs)))
    # reaction phase active, ball on the opponent side heading in
    assert np.all(np.asarray(state.tar_action) == 1)
    assert np.all(np.asarray(state.ball_pos[:, 1]) > 0)
    # humanoid near the baseline center
    assert np.all(np.abs(np.asarray(state.sim.root_pos[:, 1]) + 13.0) < 1.5)


def test_step_runs_and_stays_finite(env):
    state, obs = env.reset_all(jax.random.PRNGKey(2))
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(3)
    for t in range(20):
        key, sub = jax.random.split(key)
        act = 0.1 * jax.random.normal(sub, (4, env.num_actions))
        state, out = step(state, act)
        assert np.all(np.isfinite(np.asarray(out.obs)))
        assert np.all(np.isfinite(np.asarray(out.reward)))
    assert np.all(np.asarray(state.progress) >= 1)


def test_reaction_reset_recycles_ball(env):
    """After tar_time reaches tar_time_total a fresh incoming ball arrives."""
    state, _ = env.reset_all(jax.random.PRNGKey(4))
    # avoid episode termination interference
    state = dataclasses.replace(
        state, tar_time_total=jnp.full(4, 3, jnp.int32))
    step = jax.jit(env.step)
    act = jnp.zeros((4, env.num_actions))
    seen_reset = False
    prev_ball_y = np.asarray(state.ball_pos[:, 1]).copy()
    for t in range(6):
        state, out = step(state, act)
        tar_time = np.asarray(state.tar_time)
        if np.any(tar_time == 0) and t >= 2:
            seen_reset = True
            alive = ~np.asarray(out.done, bool)
            fresh = (tar_time == 0) & alive
            if fresh.any():
                # ball was re-launched from the opponent side
                assert np.all(np.asarray(state.ball_pos[fresh, 1]) > 0)
    assert seen_reset


def test_rewards_modes_shapes(env):
    state, _ = env.reset_all(jax.random.PRNGKey(5))
    # return modes carry [pos, ball_pos, quality, swing_speed]
    # sub-rewards (shaping terms, weight 0 unless configured)
    for mode, nsub in [("reach", 1), ("return", 4), ("return_w_estimate", 4)]:
        env2 = TennisEnv.__new__(TennisEnv)
        env2.__dict__.update(env.__dict__)
        env2.cfg = dataclasses.replace(env.cfg, reward_type=mode)
        r, subs = env2._reward(state, state.has_contact)
        assert r.shape == (4,) and subs.shape == (4, nsub)
        assert np.all(np.isfinite(np.asarray(r)))
        assert np.all(np.asarray(r) >= 0)


def test_done_envs_auto_reset(env):
    state, _ = env.reset_all(jax.random.PRNGKey(6))
    state = dataclasses.replace(state, reset_buf=jnp.ones(4, jnp.int32))
    step = jax.jit(env.step)
    state, out = step(state, jnp.zeros((4, env.num_actions)))
    # progress restarted for everyone (masked in-step reset)
    assert np.all(np.asarray(state.progress) == 1)


def test_candidate_pool_reset_matches_semantics(env):
    """Amortized K-candidate reset: done envs receive a VALID fresh state
    (reaction role, ball from the pool, zeroed progress); non-done envs are
    untouched bit-for-bit."""
    import copy
    import dataclasses as dc

    env_k = copy.copy(env)
    env_k.cfg = dc.replace(env.cfg, reset_candidates=2)
    state, _ = env.reset_all(jax.random.PRNGKey(11))
    state = dc.replace(
        state,
        reset_buf=jnp.array([1, 0, 1, 0], jnp.int32),
        progress=jnp.full(4, 33, jnp.int32))
    out = env_k._masked_env_reset(state, jax.random.PRNGKey(12))
    prog = np.asarray(out.progress)
    assert prog[0] == 0 and prog[2] == 0        # reset envs
    assert prog[1] == 33 and prog[3] == 33      # untouched envs
    np.testing.assert_array_equal(np.asarray(out.ball_pos[1]),
                                  np.asarray(state.ball_pos[1]))
    assert int(out.tar_action[0]) == 1          # fresh reaction role
    assert np.isfinite(np.asarray(out.ball_traj[0])).all()
    assert np.asarray(out.reset_buf)[[0, 2]].sum() == 0
    # distinct candidates land on distinct done envs
    assert not np.allclose(np.asarray(out.ball_pos[0]),
                           np.asarray(out.ball_pos[2]))


def test_sync_launch_gate(env):
    """Phase-synchronized launch (cfg.sync_launch): the recovery->reaction
    trigger holds until ball arrival (pool's measured flight) coincides with
    the contact phase pi at the rig's prior rate, with a bounded forced
    launch. Default-off path keeps the reference's exact `==` timing
    (physics_mvae_controller.py:216-231)."""
    import copy
    import dataclasses as dc

    env_s = copy.copy(env)
    env_s.cfg = dc.replace(env.cfg, sync_launch=True, sync_max_wait=30)
    # auto flight measurement from this pool
    pool_y = np.asarray(env.gen.traj_pool[..., 1])
    crossed = pool_y < -11.5
    has = crossed.any(axis=1)
    expect = float(np.argmax(crossed, axis=1)[has].mean())
    env_s._sync_flight = expect
    assert expect > 0.0

    state, _ = env_s.reset_all(jax.random.PRNGKey(3))
    cfg = env_s.cfg
    ttt = state.tar_time_total
    two_pi = 2.0 * np.pi

    # phase exactly flight*rate short of contact -> gate open once timed
    aligned = float(np.mod(np.pi - cfg.sync_phase_rate * expect, two_pi))
    st_a = dc.replace(state, mvae=dc.replace(
        state.mvae, phase_pred=jnp.full((4,), aligned)))
    trig = np.asarray(env_s._reaction_trigger(st_a, ttt, None))
    assert trig.all()
    # ...but never before the timed window opens
    early = np.asarray(env_s._reaction_trigger(st_a, ttt - 5, None))
    assert not early.any()

    # half a cycle out of phase -> held (68 frames off >> tol 6)...
    bad = float(np.mod(aligned + np.pi, two_pi))
    st_b = dc.replace(state, mvae=dc.replace(
        state.mvae, phase_pred=jnp.full((4,), bad)))
    held = np.asarray(env_s._reaction_trigger(st_b, ttt, None))
    assert not held.any()
    # ...until the forced launch bounds the wait
    forced = np.asarray(env_s._reaction_trigger(
        st_b, ttt + cfg.sync_max_wait, None))
    assert forced.all()

    # default-off: exact one-shot equality semantics, phase-independent
    off = np.asarray(env._reaction_trigger(st_b, ttt, None))
    assert off.all()
    off_late = np.asarray(env._reaction_trigger(st_b, ttt + 1, None))
    assert not off_late.any()


def test_sync_launch_env_constructs_and_steps():
    """A sync-enabled env auto-measures the pool flight at construction and
    steps finitely end to end."""
    key = jax.random.PRNGKey(0)
    spec = P.make_random_spec(key, hidden=32, experts=2)
    rng = np.random.default_rng(0)
    feats = (rng.standard_normal((8, P.FRAME_SIZE)) * 0.05).astype(np.float32)
    feats[:, 2] = 0.95
    cfg = TennisConfig(num_envs=2, substeps=2, max_episode_length=40,
                       reset_reaction_nframes=10, sync_launch=True)
    gen = TennisBallGenerator(num_candidates=64, seed=0)
    env = TennisEnv(cfg, spec, feats, ball_generator=gen)
    assert 0.0 < env._sync_flight < gen.traj_length
    state, obs = env.reset_all(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    for _ in range(3):
        state, out = step(state, jnp.zeros((2, env.num_actions)))
    assert np.isfinite(np.asarray(out.obs)).all()
