"""The frozen low-level policy (pi_low) embedded in the tennis env.

This is the reference's defining nesting — a trained imitation player runs
inside the high-level controller and physically tracks the MVAE kinematic
targets (`vid2player/env/utils/player_builder.py:184-206`,
`vid2player/players/im_player.py:187-202`). Tests cover the wiring
(zero-policy ≡ PD-only fallback), the checkpoint hand-off from
`ImitationPPO`, and a full train→embed pipeline.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vid2player3d_tpu.data.synthetic import make_synthetic_motion_lib
from vid2player3d_tpu.envs import (HumanoidImConfig, HumanoidImEnv,
                                   TennisConfig, TennisEnv)
from vid2player3d_tpu.learn import FrozenImitator, ImitationPPO, PPOConfig
from vid2player3d_tpu.learn import running_norm as RN
from vid2player3d_tpu.tennis import player as P
from vid2player3d_tpu.tennis.ball import TennisBallGenerator


def _tennis_env(pi_low=None, pi_low_params=None, num_envs=4):
    spec = P.make_random_spec(jax.random.PRNGKey(0), hidden=32, experts=2)
    rng = np.random.default_rng(0)
    feats = (rng.standard_normal((8, P.FRAME_SIZE)) * 0.05).astype(np.float32)
    feats[:, 2] = 0.95
    # identical cfg to the other tennis test modules → shared compile cache
    cfg = TennisConfig(num_envs=num_envs, substeps=2, max_episode_length=50,
                       reset_reaction_nframes=12)
    gen = TennisBallGenerator(num_candidates=256, seed=0)
    return TennisEnv(cfg, spec, feats, ball_generator=gen,
                     pi_low=pi_low, pi_low_params=pi_low_params)


def _rollout(env, nsteps=8, seed=2):
    state, obs = env.reset_all(jax.random.PRNGKey(seed))
    step = jax.jit(env.step)
    act = jnp.zeros((env.cfg.num_envs, env.num_actions))
    for _ in range(nsteps):
        state, out = step(state, act)
    return state, out


@pytest.mark.slow
def test_zero_policy_matches_pd_fallback():
    """A zero-weight pi_low outputs zero residuals, so the rollout must be
    bit-identical to the PD-only fallback — validates the residual-action
    wiring end to end."""
    frozen = FrozenImitator.zeros()
    pi_low, params = frozen.as_pi_low()
    s_pd, _ = _rollout(_tennis_env())
    s_pl, _ = _rollout(_tennis_env(pi_low, params))
    np.testing.assert_allclose(np.asarray(s_pd.sim.root_pos),
                               np.asarray(s_pl.sim.root_pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_pd.ball_pos),
                               np.asarray(s_pl.ball_pos), atol=1e-6)


def test_checkpoint_roundtrip_into_frozen(tmp_path):
    """ImitationPPO checkpoint → FrozenImitator reproduces the same mu with
    the same frozen normalizer stats."""
    lib = make_synthetic_motion_lib(num_motions=2, T=60, fps=30.0, seed=0)
    env = HumanoidImEnv(HumanoidImConfig(num_envs=4, substeps=2), lib, rng=0)
    agent = ImitationPPO(env, PPOConfig(horizon=4, minibatch_size=8,
                                        mini_epochs=1), seed=3)
    ts = agent.init_state()
    # make the normalizer stats non-trivial so the test catches a dropped load
    obs = jax.random.normal(jax.random.PRNGKey(9), (32, agent.obs_dim)) * 2.0
    ts = dataclasses.replace(ts, obs_norm=RN.update(ts.obs_norm, obs))
    path = os.path.join(tmp_path, "im.npz")
    agent.save_checkpoint(path, ts)

    frozen = FrozenImitator.from_checkpoint(path)
    pi_low, params = frozen.as_pi_low()
    test_obs = jax.random.normal(jax.random.PRNGKey(1), (4, agent.obs_dim))
    mu_frozen = pi_low(params, test_obs)

    obs_n = RN.normalize(ts.obs_norm, test_obs, agent.cfg.obs_clip)
    mu_direct, _ = agent.net.apply(ts.params, obs_n)
    np.testing.assert_allclose(np.asarray(mu_frozen), np.asarray(mu_direct),
                               atol=1e-6)
    assert float(params["obs_norm"].n) == 32.0


@pytest.mark.slow
def test_full_pipeline_train_then_embed(tmp_path):
    """amass_im-style train → checkpoint → tennis env with pi_low loaded:
    the hierarchical stack steps and stays finite, and the embedded policy
    actually changes the physics relative to the PD fallback."""
    lib = make_synthetic_motion_lib(num_motions=2, T=60, fps=30.0, seed=0)
    env = HumanoidImEnv(HumanoidImConfig(num_envs=8, substeps=2), lib, rng=0)
    agent = ImitationPPO(env, PPOConfig(horizon=4, minibatch_size=16,
                                        mini_epochs=1, learning_rate=1e-3),
                         seed=3)
    ts = agent.init_state()
    ts, metrics = agent.train_epoch(ts)
    assert np.isfinite(float(metrics["a_loss"]))
    path = os.path.join(tmp_path, "im.npz")
    agent.save_checkpoint(path, ts)

    frozen = FrozenImitator.from_checkpoint(path)
    pi_low, params = frozen.as_pi_low()
    env_pl = _tennis_env(pi_low, params)
    state, out = _rollout(env_pl, nsteps=6)
    assert np.all(np.isfinite(np.asarray(out.obs)))
    assert np.all(np.isfinite(np.asarray(state.sim.root_pos)))

    s_pd, _ = _rollout(_tennis_env(), nsteps=6)
    # a trained (non-zero) policy must steer the physics differently
    assert not np.allclose(np.asarray(s_pd.sim.root_pos),
                           np.asarray(state.sim.root_pos), atol=1e-4)


@pytest.mark.slow
def test_trained_pi_low_beats_pure_pd_tracking(tmp_path):
    """The point of the nesting: PD drives joints but the ROOT is unactuated,
    so only the policy's learned corrections (residual dof + residual root
    forces, `humanoid_smpl_im.py:141-154`) can keep the physics humanoid on
    the moving reference. A briefly-trained policy must track reference
    motion better than pure PD of the target dofs (the tennis env's
    pi_low=None fallback semantics), measured on the distribution the policy
    was trained for.

    Doubles as the learning-curve regression (VERDICT r02 #1): with the
    small-init residual heads the policy STARTS at PD parity, and the pose
    error must then decrease over training (checkpoints every 5 epochs,
    constant lr 1e-4 — the adaptive schedule's min-lr floor cannot learn on
    this 64-env budget)."""
    from vid2player3d_tpu.data import motion_lib as ML
    from vid2player3d_tpu.physics import engine

    lib = make_synthetic_motion_lib(num_motions=4, T=90, fps=30.0, seed=0)
    env = HumanoidImEnv(HumanoidImConfig(num_envs=64, substeps=2), lib, rng=0)
    agent = ImitationPPO(env, PPOConfig(horizon=16, minibatch_size=256,
                                        mini_epochs=4, learning_rate=1e-4,
                                        lr_schedule="constant"), seed=3)

    def tracking_error(ts, policy: bool):
        state, raw_obs, ctx = env.reset_all(jax.random.PRNGKey(7))
        step = jax.jit(env.step)
        errs = []
        for t in range(16):
            if policy:
                io, _, mu, _, _ = agent._forward(
                    env, ts.params, ts.obs_norm, raw_obs, ctx["feat"], t)
                act = mu
            else:
                # pure PD of the reference target dofs, zero residuals —
                # exactly the tennis env's pi_low=None fallback
                c_dof = agent._ctx_frame(ctx["feat"], t)[2]
                act = jnp.concatenate(
                    [c_dof, jnp.zeros((64, 6))], axis=-1)
            state, out = step(state, act)
            raw_obs = out.obs
            tar = ML.get_motion_state(env.lib, env.motion_ids,
                                      state.motion_times, adjust_height=True)
            bp, _, _, _ = engine.fk_world(env.model, state.sim)
            alive = state.reset_buf == 0
            err = jnp.linalg.norm(tar["rb_pos"] - bp, axis=-1).mean(-1)
            errs.append(jnp.where(alive, err, jnp.nan))
        e = np.asarray(jnp.stack(errs))
        return float(np.nanmean(e))

    ts = agent.init_state()
    curve = [tracking_error(ts, True)]
    for _ in range(5):
        for _ in range(5):
            ts, metrics = agent.train_epoch(ts)
        curve.append(tracking_error(ts, True))
    err_pd = tracking_error(ts, False)

    # checkpoint → FrozenImitator must reproduce the trained policy's error
    path = os.path.join(tmp_path, "im.npz")
    agent.save_checkpoint(path, ts)
    frozen = FrozenImitator.from_checkpoint(path)
    pi_low, params = frozen.as_pi_low()

    err_policy = curve[-1]
    assert all(np.isfinite(curve)) and np.isfinite(err_pd)
    # learning curve: pose error decreases over training (allow small noise
    # in the middle, require a real end-to-end drop)
    assert err_policy < curve[0] - 0.005, f"no learning: {curve}"
    assert curve[-1] <= min(curve[:2]), f"curve not improving: {curve}"
    # and the trained policy beats the pure-PD fallback
    assert err_policy < err_pd, (err_policy, err_pd, curve)


@pytest.mark.slow
def test_trained_pi_low_stable_in_tennis(tmp_path):
    """Embedding a trained policy in the tennis env must keep the physics
    finite and bounded over a rollout (the policy sees out-of-distribution
    MVAE targets from the random spec, so only stability — not tracking
    quality — is asserted here; quality needs a trained MVAE)."""
    lib = make_synthetic_motion_lib(num_motions=4, T=90, fps=30.0, seed=0)
    env = HumanoidImEnv(HumanoidImConfig(num_envs=32, substeps=2), lib, rng=0)
    agent = ImitationPPO(env, PPOConfig(horizon=16, minibatch_size=128,
                                        mini_epochs=2, learning_rate=3e-4),
                         seed=3)
    ts = agent.init_state()
    for _ in range(5):
        ts, _ = agent.train_epoch(ts)
    path = os.path.join(tmp_path, "im.npz")
    agent.save_checkpoint(path, ts)
    pi_low, params = FrozenImitator.from_checkpoint(path).as_pi_low()

    tenv = _tennis_env(pi_low, params, num_envs=4)
    state, obs = tenv.reset_all(jax.random.PRNGKey(7))
    step = jax.jit(tenv.step)
    for _ in range(20):
        state, out = step(state, jnp.zeros((4, tenv.num_actions)))
    assert np.all(np.isfinite(np.asarray(out.obs)))
    assert np.all(np.isfinite(np.asarray(state.sim.root_pos)))
