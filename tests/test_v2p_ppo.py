"""High-level PPO on the fused tennis env: one epoch end-to-end."""

import jax
import numpy as np
import pytest

from vid2player3d_tpu.envs import TennisConfig, TennisEnv
from vid2player3d_tpu.learn import V2PConfig, V2PPPO
from vid2player3d_tpu.tennis import player as P
from vid2player3d_tpu.tennis.ball import TennisBallGenerator


@pytest.fixture(scope="module")
def agent():
    key = jax.random.PRNGKey(0)
    spec = P.make_random_spec(key, hidden=32, experts=2)
    rng = np.random.default_rng(0)
    feats = (rng.standard_normal((8, P.FRAME_SIZE)) * 0.05).astype(np.float32)
    feats[:, 2] = 0.95
    cfg = TennisConfig(num_envs=4, substeps=2, max_episode_length=40,
                       reset_reaction_nframes=12)
    env = TennisEnv(cfg, spec, feats,
                    ball_generator=TennisBallGenerator(num_candidates=256))
    return V2PPPO(env, V2PConfig(horizon=8, minibatch_size=16,
                                 mini_epochs=2, actor_units=(64, 32),
                                 critic_units=(64, 32),
                                 aux_dof_res_coef=0.01,
                                 lr_schedule="adaptive"), seed=3)


@pytest.mark.slow
def test_epoch_runs_and_metrics_finite(agent):
    ts = agent.init_state()
    ts, m = agent.train_epoch(ts)
    ts, m = agent.train_epoch(ts)
    for k, v in m.items():
        assert np.isfinite(float(v)), (k, v)
    assert int(ts.epoch) == 2


def test_surgery_roundtrip(agent, tmp_path):
    ts = agent.init_state()
    path = str(tmp_path / "stage1.npz")
    agent.save_checkpoint(path, ts)
    ts2 = agent.load_stage_checkpoint(path)
    a = jax.tree_util.tree_leaves(ts.params)[0]
    b = jax.tree_util.tree_leaves(ts2.params)[0]
    assert np.allclose(np.asarray(a), np.asarray(b))


def test_normalizers_roundtrip_through_checkpoint(agent, tmp_path):
    """Weights + running obs/value stats reload together: a trained stage's
    normalizer must not silently reset to zero-mean/unit-var (reference stat
    migration, `im_agent.py:141-155`)."""
    ts = agent.init_state()
    ts, _ = agent.train_epoch(ts)   # makes stats non-trivial
    path = str(tmp_path / "stage.npz")
    agent.save_checkpoint(path, ts)
    saved_mean = np.asarray(ts.obs_norm.mean).copy()
    saved_n = float(ts.obs_norm.n)
    assert saved_n > 0

    ts2 = agent.load_stage_checkpoint(path)
    assert float(ts2.obs_norm.n) == saved_n
    np.testing.assert_allclose(np.asarray(ts2.obs_norm.mean), saved_mean,
                               atol=1e-6)


def test_single_policy_checkpoint_tiles_into_dual(agent, tmp_path):
    """Dual warm-start from a single-player stage checkpoint broadcasts the
    params across the policy axis (the reference loads per-player single
    checkpoints into each dual net, `v2p_player.py:21-111`)."""
    import dataclasses

    ts = agent.init_state()
    path = str(tmp_path / "single.npz")
    agent.save_checkpoint(path, ts)

    dual = V2PPPO(agent.env,
                  dataclasses.replace(agent.cfg, num_policies=2), seed=4)
    ts_d = dual.load_stage_checkpoint(path)
    leaf = jax.tree_util.tree_leaves(ts_d.params)[0]
    single_leaf = jax.tree_util.tree_leaves(ts.params)[0]
    assert leaf.shape == (2,) + single_leaf.shape
    np.testing.assert_allclose(np.asarray(leaf[0]), np.asarray(single_leaf),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(leaf[1]), np.asarray(single_leaf),
                               atol=1e-6)


def test_resume_restores_epoch_and_optimizer(agent, tmp_path):
    """Full-state resume: the DR schedule's epoch counter and the Adam
    moments survive a save/load cycle (rl_games full-state resume; without
    the epoch a resumed run re-anneals scheduled DR noise from zero)."""
    import jax

    ts = agent.init_state()
    ts, _ = agent.train_epoch(ts)
    path = str(tmp_path / "resume.npz")
    agent.save_checkpoint(path, ts)
    nu_saved = jax.tree_util.tree_leaves(ts.opt_state)[2]

    ts2 = agent.load_stage_checkpoint(path)
    assert int(ts2.epoch) == int(ts.epoch) == 1
    # purity: a later plain init_state is unaffected by the load above
    assert int(agent.init_state().epoch) == 0
    nu_loaded = jax.tree_util.tree_leaves(ts2.opt_state)[2]
    np.testing.assert_allclose(np.asarray(nu_loaded, np.float32),
                               np.asarray(nu_saved, np.float32), atol=1e-6)
