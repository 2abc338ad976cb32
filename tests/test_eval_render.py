"""Per-swing-cycle eval stats, select_best ranking, HTML rollout renderer."""

import os

import jax
import numpy as np
import pytest

from vid2player3d_tpu.envs import TennisConfig, TennisEnv
from vid2player3d_tpu.eval import eval_tennis, export_rollout, select_best
from vid2player3d_tpu.learn import V2PPPO
from vid2player3d_tpu.learn.v2p_ppo import V2PConfig
from vid2player3d_tpu.tennis import player as P
from vid2player3d_tpu.tennis.ball import TennisBallGenerator
from vid2player3d_tpu.vis import render_html


@pytest.fixture(scope="module")
def agent():
    spec = P.make_random_spec(jax.random.PRNGKey(0), hidden=32, experts=2)
    rng = np.random.default_rng(0)
    feats = (rng.standard_normal((8, P.FRAME_SIZE)) * 0.05).astype(np.float32)
    feats[:, 2] = 0.95
    cfg = TennisConfig(num_envs=4, substeps=2, max_episode_length=50,
                       reset_reaction_nframes=12)
    env = TennisEnv(cfg, spec, feats,
                    ball_generator=TennisBallGenerator(num_candidates=256,
                                                       seed=0))
    return V2PPPO(env, V2PConfig(horizon=4, minibatch_size=8, mini_epochs=1,
                                 actor_units=(32,), critic_units=(32,)),
                  seed=1)


@pytest.mark.slow
def test_eval_tennis_per_cycle_stats(agent):
    # num_steps must exceed the fixture's max_episode_length (50): physics
    # rollouts are chaotic, so compile-environment float differences (cache
    # state, fusion choices) legitimately change WHEN a cycle completes —
    # the round-4 flake at num_steps=40 was exactly this. At >=51 steps the
    # bound is structural, not numerical: every env reaches done by step 50
    # and a done-while-in-reaction counts as a finished (missed) cycle, so
    # cycles >= 1 holds for any trajectory realization.
    report, stats_pe = eval_tennis(agent, num_steps=60, per_env=True)
    assert report["cycles"] >= 1  # structurally guaranteed, see above
    for k in ("hit_rate", "bounce_in_rate", "fh_ratio"):
        assert 0.0 <= report[k] <= 1.0
    assert stats_pe["hit_rate"].shape == (4,)
    assert stats_pe["distance"].shape == (4,)
    assert np.all(stats_pe["distance"] >= 0)


def test_select_best_ranks_by_distance(agent):
    stats_pe = dict(
        bounce_in_rate=np.array([1.0, 0.5, 1.0, 0.99]),
        fh_ratio=np.array([0.5, 0.1, 0.7, 0.3]),
        cycles=np.array([3, 3, 3, 3]),
        distance=np.array([1.0, 9.0, 5.0, 4.0]),
    )
    # qualifying: env 0 (in=1.0, fh=.5) and env 3 (in=.99, fh=.3);
    # env 2 fails fh, env 1 fails bounce-in; sorted by distance desc
    ids = select_best(stats_pe, num=4)
    assert list(ids) == [3, 0]
    # no qualifiers -> fall back to all, by distance
    stats_pe["bounce_in_rate"] = np.zeros(4)
    ids = select_best(stats_pe, num=2)
    assert list(ids) == [1, 2]


@pytest.mark.slow
def test_export_and_render_html(agent, tmp_path):
    npz = os.path.join(tmp_path, "roll.npz")
    export_rollout(agent, npz, num_steps=12)
    data = np.load(npz)
    assert data["body_pos"].shape[0] == 12
    out = os.path.join(tmp_path, "roll.html")
    render_html(npz, out, env_ids=[0, 2])
    html = open(out).read()
    assert "<canvas" in html and "env 2" not in html  # ids embedded as data
    assert '"envs": [0, 2]' in html
    assert len(html) < 8_000_000


@pytest.mark.slow
def test_imitation_export_with_ref_ghost(tmp_path):
    import jax

    from vid2player3d_tpu.data.synthetic import make_synthetic_motion_lib
    from vid2player3d_tpu.envs import HumanoidImConfig, HumanoidImEnv
    from vid2player3d_tpu.eval import export_imitation_rollout
    from vid2player3d_tpu.learn import ImitationPPO, PPOConfig

    lib = make_synthetic_motion_lib(num_motions=2, T=60, fps=30.0, seed=0)
    env = HumanoidImEnv(HumanoidImConfig(num_envs=4, substeps=2), lib, rng=0)
    im = ImitationPPO(env, PPOConfig(horizon=4, minibatch_size=8,
                                     mini_epochs=1), seed=3)
    npz = os.path.join(tmp_path, "im.npz")
    export_imitation_rollout(im, npz, num_steps=40)
    data = np.load(npz)
    assert data["body_pos"].shape == (40, 4, 24, 3)
    assert data["ref_body_pos"].shape == (40, 4, 24, 3)
    out = os.path.join(tmp_path, "im.html")
    render_html(npz, out, env_ids=[0, 1])
    html = open(out).read()
    # two skeletons per env frame (sim + reference ghost)
    assert '"envs": [0, 1]' in html


def test_dual_render_pairs_lanes(tmp_path):
    T, N = 6, 4
    body = np.zeros((T, N, 24, 3), np.float32)
    body[:, 1, :, 0] = 2.0   # odd partner at x=2 -> mirrored to -2
    body[:, 1, :, 1] = -13.0
    roll = {"body_pos": body, "ball_pos": np.zeros((T, N, 3), np.float32),
            "racket_pos": np.zeros((T, N, 3), np.float32)}
    out = os.path.join(tmp_path, "dual.html")
    render_html(roll, out, dual=True)
    html = open(out).read()
    assert '"envs": [0, 2]' in html
    assert "-2.0" in html and "13.0" in html  # mirrored partner embedded
