"""Imitation env: shapes, determinism, reward sanity, tracking-under-PD."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vid2player3d_tpu.data.synthetic import make_synthetic_motion_lib
from vid2player3d_tpu.envs import HumanoidImEnv, HumanoidImConfig
from vid2player3d_tpu.envs.obs import IMITATION_OBS_DIM


@pytest.fixture(scope="module")
def env():
    lib = make_synthetic_motion_lib(num_motions=2, T=90, fps=30.0, seed=0)
    cfg = HumanoidImConfig(num_envs=4, substeps=4)
    return HumanoidImEnv(cfg, lib, rng=0)


def test_reset_shapes(env):
    state, obs, ctx = env.reset_all(jax.random.PRNGKey(0))
    N = env.cfg.num_envs
    assert obs.shape == (N, env.obs_dim)
    L = env.cfg.context_length + 2 * env.cfg.context_padding
    assert ctx["feat"].shape == (N, L, 72 + 96 + 69 + 72 + 69)
    assert ctx["mask"].shape == (N, L)
    assert np.isfinite(np.asarray(obs)).all()


def test_reset_matches_reference_state(env):
    """After reset the simulated body pose equals the sampled motion state."""
    state, obs, _ = env.reset_all(jax.random.PRNGKey(1))
    from vid2player3d_tpu.data import motion_lib as ML
    ref = ML.get_motion_state(env.lib, env.motion_ids, state.motion_times)
    d = env.split_obs(obs)
    np.testing.assert_allclose(np.asarray(d["body_pos"][:, 0]),
                               np.asarray(ref["root_pos"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(d["dof_pos"]),
                               np.asarray(ref["dof_pos"]), atol=1e-3)


def test_step_shapes_and_determinism(env):
    state, obs, _ = env.reset_all(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    a = jnp.zeros((env.cfg.num_envs, env.num_actions))
    s1, out1 = step(state, a)
    s2, out2 = step(state, a)
    np.testing.assert_array_equal(np.asarray(out1.obs), np.asarray(out2.obs))
    assert out1.reward.shape == (env.cfg.num_envs,)
    assert out1.sub_rewards.shape == (env.cfg.num_envs, 4)
    assert np.isfinite(np.asarray(out1.obs)).all()
    assert np.isfinite(np.asarray(out1.reward)).all()


def test_tracking_with_ref_actions(env):
    """Feeding the reference motion's own dof targets as actions should yield
    high imitation reward over a short horizon (physics can track kinematics)."""
    from vid2player3d_tpu.data import motion_lib as ML
    state, obs, _ = env.reset_all(jax.random.PRNGKey(2))
    step = jax.jit(env.step)
    rewards = []
    for t in range(10):
        tar = ML.get_motion_state(env.lib, env.motion_ids,
                                  state.motion_times + env.cfg.control_dt)
        a = jnp.concatenate([tar["dof_pos"],
                             jnp.zeros((env.cfg.num_envs, 6))], axis=-1)
        state, out = step(state, a)
        rewards.append(np.asarray(out.reward))
    rewards = np.stack(rewards)
    alive = np.asarray(state.reset_buf) == 0
    assert alive.any()
    # mean reward of alive envs should be clearly above random-action levels
    assert rewards[:, alive].mean() > 0.45, rewards.mean(0)


def test_done_latching_and_zero_reward(env):
    state, obs, _ = env.reset_all(jax.random.PRNGKey(3))
    # force done on env 0
    state = type(state)(
        sim=state.sim, progress=state.progress,
        reset_buf=state.reset_buf.at[0].set(1),
        terminate_buf=state.terminate_buf,
        motion_times=state.motion_times)
    step = jax.jit(env.step)
    a = jnp.ones((env.cfg.num_envs, env.num_actions)) * 0.1
    s, out = step(state, a)
    assert int(s.reset_buf[0]) == 1
    assert float(out.reward[0]) == 0.0


def test_imitation_obs_dim(env):
    state, obs, ctx = env.reset_all(jax.random.PRNGKey(0))
    L0 = env.cfg.context_padding
    feat = ctx["feat"][:, L0]  # current frame
    N = env.cfg.num_envs
    body_pos = feat[:, :72].reshape(N, 24, 3)
    body_rot = feat[:, 72:168].reshape(N, 24, 4)
    dof = feat[:, 168:237]
    io = env.imitation_obs(obs, body_pos, body_rot, dof)
    assert io.shape == (N, IMITATION_OBS_DIM)
    assert np.isfinite(np.asarray(io)).all()
