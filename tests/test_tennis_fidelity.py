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


@pytest.mark.slow
def test_head_fix_env_steps():
    env = _env(fix_head_orientation=True)
    state, _ = env.reset_all(jax.random.PRNGKey(2))
    step = jax.jit(env.step)
    for _ in range(3):
        state, out = step(state, jnp.zeros((4, env.num_actions)))
    assert np.all(np.isfinite(np.asarray(out.obs)))


@pytest.mark.slow
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


def test_two_hand_env_wiring_moves_free_hand():
    """Env-level two-hand fix (VERDICT r02 missing #1): on a bh-phase frame
    the env's `_apply_two_hand` pulls the free hand onto the racket-handle
    target (`mvae_controller_vis.py:181-190` mask; in-step application
    behind `TennisConfig.two_hand_backhand`); non-bh frames pass through."""
    from vid2player3d_tpu.core.smpl import (SMPL_BONE_ORDER_NAMES,
                                            batch_rigid_transform)
    from vid2player3d_tpu.tennis.twohand import two_hand_target

    env = _env(two_hand_backhand=True, two_hand_iters=20)
    state, _ = env.reset_all(jax.random.PRNGKey(6))
    # rows 0,1 mid-backhand; rows 2,3 out of swing phase
    mvae = dataclasses.replace(
        state.mvae,
        phase_pred=jnp.array([3.0, 2.5, 1.0, 3.0]),
        swing_type=jnp.array([2, 2, 2, 1], jnp.int32))
    fixed = env._apply_two_hand(mvae)

    rest = env.rest_joints_smpl
    posed0, _ = batch_rigid_transform(mvae.joint_rotmat, rest)
    posed1, _ = batch_rigid_transform(fixed.joint_rotmat, rest)
    tgt = two_hand_target(posed0, righthand=True)
    fh = SMPL_BONE_ORDER_NAMES.index("L_Hand")
    err0 = np.linalg.norm(np.asarray(posed0[:, fh] - tgt), axis=-1)
    err1 = np.linalg.norm(np.asarray(posed1[:, fh] - tgt), axis=-1)
    assert (err1[:2] < err0[:2]).all(), (err0, err1)
    # fh swing / out-of-phase rows untouched
    np.testing.assert_allclose(np.asarray(fixed.joint_rotmat[2:]),
                               np.asarray(mvae.joint_rotmat[2:]), atol=1e-7)


def test_reaction_ball_tracks_far_side_x():
    """Opponent-position-conditioned pool sampling (VERDICT r02 missing #4):
    when the previous ball ended on the far side, the new launch x tracks it
    (`tennis_ball.py:437-442` start_pos window via
    `humanoid_smpl_im_mvae.py:505-506`)."""
    env = _env()
    state, _ = env.reset_all(jax.random.PRNGKey(8))
    state = dataclasses.replace(
        state,
        ball_pos=jnp.array([[-3.0, 5.0, 1.0], [-3.0, 6.0, 1.0],
                            [3.0, 5.0, 1.0], [3.0, 6.0, 1.0]]))
    _, lpos, lvel, lspin, ok = env._reaction_ball(
        state, jax.random.PRNGKey(9), None, None)
    lx = np.asarray(lpos[:, 0])
    assert np.asarray(ok).all()
    assert lx[:2].mean() < lx[2:].mean(), lx
    assert abs(lx[0] - (-3.0)) < 2.0 and abs(lx[2] - 3.0) < 2.0, lx


def _contact_state(env, ball_pos, ball_vel, tar_action=1):
    state, _ = env.reset_all(jax.random.PRNGKey(3))
    N = env.cfg.num_envs
    return dataclasses.replace(
        state,
        ball_pos=jnp.tile(jnp.asarray(ball_pos)[None], (N, 1)),
        ball_vel=jnp.tile(jnp.asarray(ball_vel)[None], (N, 1)),
        ball_vspin=jnp.zeros(N),
        tar_action=jnp.full(N, tar_action, jnp.int32),
        has_contact=jnp.zeros(N, bool),
        racket_pos=jnp.tile(jnp.array([0.0, -12.0, 1.0]), (N, 1)),
        racket_normal=jnp.tile(jnp.array([0.0, 1.0, 0.0]), (N, 1)))


def test_ball_body_contact_blocks_tunneling():
    """Ball-vs-body spheres (VERDICT r02 missing #3): with the body spheres
    passed in, a ball aimed through the torso deflects instead of
    tunneling; without them it sails through."""
    env = _env()
    # ball one frame in front of a torso sphere at (0,-13,1.0), flying -y
    state = _contact_state(env, [0.0, -12.7, 1.0], [0.0, -10.0, 0.0],
                           tar_action=0)   # no racket contact gate
    N = env.cfg.num_envs
    centers = jnp.tile(jnp.array([0.0, -13.0, 1.0]), (N, 24, 1))
    radii = jnp.full((N, 24), 0.15)

    out_free = env._ball_physics(state, state.racket_pos,
                                 state.racket_normal)
    out_body = env._ball_physics(state, state.racket_pos,
                                 state.racket_normal, centers, radii)
    y_free = np.asarray(out_free[0][:, 1])
    y_body = np.asarray(out_body[0][:, 1])
    assert (y_free < -13.0).all(), y_free       # tunneled through
    assert (y_body > y_free + 0.05).all(), (y_body, y_free)  # deflected
    assert np.isfinite(np.asarray(out_body[1])).all()


def test_racket_bounce_substep_stability():
    """Racket-contact substep sensitivity (VERDICT r02 weak #5; the
    reference itself needed two bounce thresholds across substep settings,
    `humanoid_smpl_im_mvae.py:731-734`): the swept-disc contact must give
    nearly the same outgoing ball across substeps=2 and substeps=6."""
    def _env_ss(ss):
        spec = P.make_random_spec(jax.random.PRNGKey(0), hidden=32, experts=2)
        rng = np.random.default_rng(0)
        feats = (rng.standard_normal((8, P.FRAME_SIZE)) * 0.05
                 ).astype(np.float32)
        feats[:, 2] = 0.95
        cfg = TennisConfig(num_envs=4, substeps=ss, max_episode_length=50,
                           reset_reaction_nframes=12)
        return TennisEnv(cfg, spec, feats,
                         ball_generator=TennisBallGenerator(
                             num_candidates=256, seed=0))

    outs = {}
    for ss in (2, 6):
        env = _env() if ss == 2 else _env_ss(6)
        state = _contact_state(env, [0.0, -11.6, 1.0], [0.0, -12.0, 0.0])
        res = env._ball_physics(state, state.racket_pos,
                                state.racket_normal)
        pos, vel, vspin, contact = res[0], res[1], res[2], res[3]
        assert np.asarray(contact).all(), f"substeps={ss}: no contact"
        outs[ss] = (np.asarray(vel), np.asarray(vspin))
    v2, s2 = outs[2]
    v6, s6 = outs[6]
    # outgoing y-velocity (the reflected component) within 15%
    assert np.allclose(v2[:, 1], v6[:, 1], rtol=0.15), (v2, v6)
    assert np.allclose(s2, s6, rtol=0.2, atol=0.3), (s2, s6)


def test_racket_constants_produce_plausible_returns():
    """Sweep-validate racket_restitution / spin_gain (VERDICT r02 weak #5)
    against the flight model: typical pool balls reflected off a forward-
    swinging racket must clear the net and come down in the far court."""
    from vid2player3d_tpu.tennis import ball as B

    env = _env()
    cfg = env.cfg
    rng = np.random.default_rng(0)
    n = 64
    # incoming balls at a typical contact point: 10-18 m/s toward the
    # player, slightly descending; racket swings forward 4-9 m/s with a
    # slightly open face (normal tilted up ~11 deg)
    vel_in = jnp.asarray(np.stack([
        rng.uniform(-2, 2, n), -rng.uniform(10, 18, n),
        -rng.uniform(1, 4, n)], -1), jnp.float32)
    racket_vel = jnp.asarray(np.stack([
        np.zeros(n), rng.uniform(4, 9, n), np.full(n, 1.0)], -1),
        jnp.float32)
    pos = jnp.tile(jnp.array([0.0, -12.0, 1.0]), (n, 1))
    normal = jnp.tile(jnp.array([0.0, 1.0, 0.2]), (n, 1))
    normal = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)

    rel = vel_in - racket_vel
    vn = jnp.sum(rel * normal, axis=-1, keepdims=True)
    out_vel = racket_vel + rel - (1.0 + cfg.racket_restitution) * vn * normal
    tang = rel - vn * normal
    out_spin = jnp.clip(cfg.spin_gain * jnp.linalg.norm(tang, axis=-1),
                        0.0, cfg.spin_cap)
    res = B.simulate_flight(pos, out_vel, out_spin, num_frames=90)
    passed = np.asarray(res.pass_net)
    bounced = np.asarray(res.has_bounce)
    by = np.asarray(res.bounce_pos[:, 1])
    assert passed.mean() > 0.6, passed.mean()
    in_far = (passed & bounced & (by > 0.0) & (by < 15.0)).mean()
    assert in_far > 0.5, (in_far, by)
    # the median return comes down around the opponent's baseline (~12 m)
    med = np.median(by[passed & bounced])
    assert 6.0 < med < 15.0, med


def test_racket_mass_welded_into_wrist():
    """The reference racket is two geoms welded to the wrist (no joint,
    `smpl_mesh_humanoid_federer.xml:188-191`, ~0.59 kg); folding that
    mass/inertia into the wrist body is the exact rigid-body reduction."""
    env = _env()                                    # simulated_racket_mass on
    env_off = _env(simulated_racket_mass=False)
    import numpy as _np
    w = int(_np.asarray(env.wrist_id)[0])   # homogeneous single-player env
    dm = np.asarray(env.model.body_mass[:, w]
                    - env_off.model.body_mass[:, w])
    np.testing.assert_allclose(dm, 0.591, atol=1e-3)
    # only the wrist body changed
    other = [j for j in range(24) if j != w]
    np.testing.assert_array_equal(
        np.asarray(env.model.body_mass[:, other]),
        np.asarray(env_off.model.body_mass[:, other]))
    # inertia grew and stays symmetric positive definite
    I = np.asarray(env.model.body_inertia[:, w], np.float64)
    np.testing.assert_allclose(I, np.swapaxes(I, -1, -2), atol=1e-9)
    assert (np.linalg.eigvalsh(I) > 0).all()
    assert (np.trace(I[0]) > np.trace(
        np.asarray(env_off.model.body_inertia[0, w], np.float64)))
    # COM moved toward the racket (along the grip direction)
    dcom = np.asarray(env.model.body_com[0, w]
                      - env_off.model.body_com[0, w])
    assert float(dcom @ np.asarray(env.racket_dir_c)[0]) > 0.05
