"""Tennis behavior fidelity pack (VERDICT round-1 item 5).

Covers: head look-at-ball fix (`humanoid_smpl_im_mvae.py:605-634`), serve
ball-toss synthesis (`:526-560`), +3 residual-root action
(`physics_mvae_controller.py:148-156`, `:603`), two-hand backhand IK
(`:948-1031`), and the two-way ball→racket reaction coupling (`:367-442`).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vid2player3d_tpu.envs import TennisConfig, TennisEnv
from vid2player3d_tpu.tennis import player as P
from vid2player3d_tpu.tennis.ball import TennisBallGenerator


def _env(pi_low=None, pi_low_params=None, **cfg_kw):
    spec = P.make_random_spec(jax.random.PRNGKey(0), hidden=32, experts=2)
    rng = np.random.default_rng(0)
    feats = (rng.standard_normal((8, P.FRAME_SIZE)) * 0.05).astype(np.float32)
    feats[:, 2] = 0.95
    # identical base cfg to the other tennis test modules → shared cache
    cfg = TennisConfig(num_envs=4, substeps=2, max_episode_length=50,
                       reset_reaction_nframes=12, **cfg_kw)
    gen = TennisBallGenerator(num_candidates=256, seed=0)
    return TennisEnv(cfg, spec, feats, ball_generator=gen,
                     pi_low=pi_low, pi_low_params=pi_low_params)


def _random_pi_low():
    """Non-zero frozen policy: obs-dependent, so target shifts that enter
    only through the low-level obs still steer the physics."""
    from vid2player3d_tpu.learn import FrozenImitator

    frozen = FrozenImitator.zeros()
    frozen.params = frozen.net.init(jax.random.PRNGKey(5),
                                    jnp.zeros((1, 734)))
    return frozen.as_pi_low()


def test_head_fix_turns_head_toward_ball():
    env = _env(fix_head_orientation=True)
    state, _ = env.reset_all(jax.random.PRNGKey(1))
    # ball far to the player's side to force a yaw correction
    ball = jnp.tile(jnp.array([3.0, 0.0, 1.5]), (4, 1))
    fixed = env._fix_head_orientation(state.mvae, ball)
    assert not np.allclose(np.asarray(fixed.joint_rotmat[:, env._HEAD]),
                           np.asarray(state.mvae.joint_rotmat[:, env._HEAD]))
    # missed ball → no correction
    behind = jnp.tile(jnp.array([0.0, -30.0, 1.0]), (4, 1))
    kept = env._fix_head_orientation(state.mvae, behind)
    np.testing.assert_allclose(np.asarray(kept.joint_rotmat),
                               np.asarray(state.mvae.joint_rotmat), atol=1e-5)


def test_head_fix_env_steps():
    env = _env(fix_head_orientation=True)
    state, _ = env.reset_all(jax.random.PRNGKey(2))
    step = jax.jit(env.step)
    for _ in range(3):
        state, out = step(state, jnp.zeros((4, env.num_actions)))
    assert np.all(np.isfinite(np.asarray(out.obs)))


def test_residual_root_action_dims_and_effect():
    """The residual-root action shifts the kinematic target root, which
    reaches the physics through the embedded policy's observation
    (`humanoid_smpl_im_mvae.py:603` target_root_pos += res_root) — so the
    effect requires a (non-constant) pi_low."""
    pi_low, params = _random_pi_low()
    env = _env(pi_low, params, add_residual_root=True)
    assert env.num_actions == 32 + 3 + 3
    state, _ = env.reset_all(jax.random.PRNGKey(3))
    step = jax.jit(env.step)
    act = jnp.zeros((4, env.num_actions))
    # push the target root via the residual-root slice
    act_push = act.at[:, 35:38].set(jnp.array([20.0, 0.0, 0.0]))
    s0, _ = step(state, act)
    s1, _ = step(state, act_push)
    assert not np.allclose(np.asarray(s0.sim.joint_omega),
                           np.asarray(s1.sim.joint_omega), atol=1e-7)


def test_serve_toss_reaches_apex():
    env = _env(init_ball_type="serve_toss")
    state, obs = env.reset_all(jax.random.PRNGKey(4))
    # ball starts near the free hand, below ~2 m
    assert np.all(np.asarray(state.ball_pos[:, 2]) < 2.0)
    # toss rises towards the ~2.7 m apex within the first second
    traj = np.asarray(state.ball_traj)
    apex = traj[:, :40, 2].max(axis=1)
    assert np.all(apex > 2.0), apex
    assert np.all(np.isfinite(np.asarray(obs)))


def test_ball_reaction_force_coupling():
    """With a pending contact impulse, the wrist must be pushed compared to
    the impulse-free step."""
    env = _env(ball_reaction_force=True)
    state, _ = env.reset_all(jax.random.PRNGKey(5))
    step = jax.jit(env.step)
    act = jnp.zeros((4, env.num_actions))
    big = jnp.tile(jnp.array([0.0, 2.0, 0.5]), (4, 1))  # N·s on the ball
    state_imp = dataclasses.replace(state, racket_impulse=big)
    s0, _ = step(state, act)
    s1, _ = step(state_imp, act)
    d0 = np.asarray(s0.sim.joint_omega)
    d1 = np.asarray(s1.sim.joint_omega)
    assert not np.allclose(d0, d1, atol=1e-6)


def test_two_hand_backhand_closes_gap():
    from vid2player3d_tpu.core.smpl import batch_rigid_transform
    from vid2player3d_tpu.tennis.twohand import (optimize_two_hand_backhand,
                                                 two_hand_target)

    env = _env()
    state, _ = env.reset_all(jax.random.PRNGKey(6))
    rm = state.mvae.joint_rotmat
    # SMPL-order rest joints for this env's bodies
    rest = env.model.joint_pos
    import numpy as onp

    from vid2player3d_tpu.core import smpl as S

    off = onp.asarray(rest)
    g = onp.zeros_like(off)
    for j in range(1, 24):
        g[:, j] = g[:, env.model.parents[j]] + off[:, j]
    rest_smpl = jnp.asarray(g[:, S.MUJOCO_2_SMPL])

    posed0, _ = batch_rigid_transform(rm, rest_smpl)
    tgt = two_hand_target(posed0, righthand=True)
    from vid2player3d_tpu.core.smpl import SMPL_BONE_ORDER_NAMES

    fh = SMPL_BONE_ORDER_NAMES.index("L_Hand")
    err0 = np.linalg.norm(np.asarray(posed0[:, fh] - tgt), axis=-1)

    rm2 = optimize_two_hand_backhand(rm, rest_smpl, righthand=True, iters=40)
    posed1, _ = batch_rigid_transform(rm2, rest_smpl)
    err1 = np.linalg.norm(np.asarray(posed1[:, fh] - tgt), axis=-1)
    assert err1.mean() < err0.mean() * 0.5, (err0.mean(), err1.mean())
    # only the free arm changed
    untouched = [i for i in range(24) if i not in (13, 16, 18, 20)]
    np.testing.assert_allclose(np.asarray(rm2[:, untouched]),
                               np.asarray(rm[:, untouched]), atol=1e-6)


def test_two_hand_mask_passthrough():
    from vid2player3d_tpu.tennis.twohand import optimize_two_hand_backhand

    env = _env()
    state, _ = env.reset_all(jax.random.PRNGKey(7))
    rm = state.mvae.joint_rotmat
    rest = jnp.tile(jnp.linspace(0, 1, 72).reshape(1, 24, 3), (4, 1, 1))
    mask = jnp.array([True, False, True, False])
    rm2 = optimize_two_hand_backhand(rm, rest, iters=5, mask=mask)
    np.testing.assert_allclose(np.asarray(rm2[1]), np.asarray(rm[1]),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(rm2[3]), np.asarray(rm[3]),
                               atol=1e-7)
