"""Network-side context-IK pipeline + aux supervised losses.

The reference's imitation network splits the context features, runs
differentiable IK on the (possibly corrupted) joint positions with residual
phis/leaf rotations, and trains with aux dof-rot6d/body-pos supervision
(`embodied_pose/models/im_network_builder.py:78-138`,
`embodied_pose/env/tasks/humanoid_smpl_im.py:694-722`,
`embodied_pose/agents/im_agent.py:475-587`).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vid2player3d_tpu.data.synthetic import make_synthetic_motion_lib
from vid2player3d_tpu.envs import HumanoidImConfig, HumanoidImEnv
from vid2player3d_tpu.envs.corrupt import TransformSpecs
from vid2player3d_tpu.learn import ImitationPPO, PPOConfig


SPECS = TransformSpecs(noisy_joints_prob=0.5, noisy_joints_noise_std=0.02,
                       noisy_joints_conf_std=0.02, noisy_joints_min_conf=0.1,
                       mask_random_joints_prob=0.05)


def _agent(transform_specs=SPECS, num_envs=4, **ppo_kw):
    lib = make_synthetic_motion_lib(num_motions=2, T=60, fps=30.0, seed=0)
    env = HumanoidImEnv(
        HumanoidImConfig(num_envs=num_envs, substeps=2,
                         transform_specs=transform_specs), lib, rng=0)
    ppo_kw.setdefault("horizon", 4)
    ppo_kw.setdefault("minibatch_size", 2 * num_envs)
    ppo_kw.setdefault("mini_epochs", 1)
    cfg = PPOConfig(use_context_ik=True, **ppo_kw)
    return ImitationPPO(env, cfg, seed=3)


def test_context_targets_recover_clean_pose():
    """With CLEAN context positions and zero-init heads, the IK targets must
    reproduce the ground-truth joint positions closely (identity twist IK on
    exact joint locations)."""
    agent = _agent(transform_specs=None)
    env = agent.env
    ts = agent.init_state()
    state, raw_obs, ctx = env.reset_all(jax.random.PRNGKey(0))
    cb_pos, cb_rot, c_dof, gt_pos, gt_dof = agent._ctx_frame(ctx["feat"], 0)
    conf = jnp.ones(cb_pos.shape[:-1])
    tgt_dof, tgt_pos, tgt_rot, local = agent._context_targets(
        ts.params, cb_pos, conf, env.rest_joints_smpl)
    assert np.all(np.isfinite(np.asarray(tgt_dof)))
    # IK joint reconstruction error vs the observed positions (which here
    # equal GT): twist-swing IK is exact on positions up to leaf joints
    err = np.linalg.norm(np.asarray(tgt_pos - gt_pos), axis=-1)
    assert err.mean() < 0.05, err.mean()


def test_forward_shapes_and_residual_base():
    agent = _agent()
    env = agent.env
    ts = agent.init_state()
    state, raw_obs, ctx = env.reset_all(jax.random.PRNGKey(0))
    io, io_n, mu, value, c_dof = agent._forward(
        env, ts.params, ts.obs_norm, raw_obs, ctx["feat"], 0, ctx["conf"])
    assert io.shape == (4, 734)
    assert mu.shape == (4, env.num_actions)
    assert c_dof.shape == (4, 69)
    assert np.all(np.isfinite(np.asarray(mu)))


@pytest.mark.slow
def test_train_epoch_aux_losses_finite_and_learning():
    """A train epoch under corruption must produce finite aux losses, and a
    few epochs must DECREASE the aux dof loss (the context heads learn)."""
    agent = _agent(num_envs=8, minibatch_size=16, learning_rate=3e-4)
    ts = agent.init_state()
    ts, m0 = agent.train_epoch(ts)
    assert np.isfinite(float(m0["aux_dof_loss"]))
    assert np.isfinite(float(m0["aux_pos_loss"]))
    assert float(m0["aux_dof_loss"]) > 0.0
    for _ in range(6):
        ts, m = agent.train_epoch(ts)
    assert np.isfinite(float(m["a_loss"]))
    # zero-init heads start at the identity-twist IK solution; training on
    # the aux losses should not blow it up (and typically improves it)
    assert float(m["aux_dof_loss"]) <= float(m0["aux_dof_loss"]) * 1.5


@pytest.mark.slow
def test_confidence_channel_changes_output():
    """The conf channel must actually be consumed: zeroing it changes the
    context-head input and (after one gradient step on non-zero heads) the
    IK targets."""
    agent = _agent(num_envs=8, minibatch_size=16, learning_rate=1e-3)
    ts = agent.init_state()
    ts, _ = agent.train_epoch(ts)  # heads now non-zero
    env = agent.env
    state, raw_obs, ctx = env.reset_all(jax.random.PRNGKey(1))
    cb_pos, *_ = agent._ctx_frame(ctx["feat"], 0)
    conf1 = jnp.ones(cb_pos.shape[:-1])
    conf0 = jnp.zeros(cb_pos.shape[:-1])
    d1, p1, r1, _ = agent._context_targets(ts.params, cb_pos, conf1,
                                           env.rest_joints_smpl)
    d0, p0, r0, _ = agent._context_targets(ts.params, cb_pos, conf0,
                                           env.rest_joints_smpl)
    assert not np.allclose(np.asarray(d1), np.asarray(d0))


def test_checkpoint_embeds_into_frozen(tmp_path):
    """Context-IK checkpoints still hand off to FrozenImitator (the tennis
    embedding needs only the actor subtree)."""
    import os

    from vid2player3d_tpu.learn import FrozenImitator

    agent = _agent()
    ts = agent.init_state()
    path = os.path.join(tmp_path, "im_ctx.npz")
    agent.save_checkpoint(path, ts)
    frozen = FrozenImitator.from_checkpoint(path)
    pi_low, params = frozen.as_pi_low()
    obs = jax.random.normal(jax.random.PRNGKey(0), (3, 734))
    mu = pi_low(params, obs)
    assert mu.shape == (3, agent.num_actions)
    assert np.all(np.isfinite(np.asarray(mu)))
