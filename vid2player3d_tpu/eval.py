"""Evaluation & rollout-export suite (reference test-time players +
`mvae_controller_vis.py:81-95` behavioral stats).

`evaluate(agent)` runs deterministic (mu-action) rollouts and reports:

- imitation agents: reward mean, sub-rewards (dof/vel/pos/rot tracking),
  alive ratio (reference `common_player.py:116-132`, `im_agent.py:236-238`)
- tennis agents: hit rate, bounce-in rate, bounce position error, forehand
  ratio — computed per finished episode (reference accumulates per swing
  cycle, `mvae_controller_vis.py:81-95`)

`export_rollout(agent, path)` dumps a host-side npz with per-frame root /
joint / ball / racket state — the data contract for any offline visualizer
(replacing the vtk/scenepic `smpl_visualizer` render path, which is out of
the perf-critical scope; SURVEY.md §2.1).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def evaluate(agent, num_epochs: int = 5, steps_per_epoch: Optional[int] = None,
             ts=None) -> Dict[str, float]:
    from vid2player3d_tpu.learn.ppo import ImitationPPO
    from vid2player3d_tpu.learn.v2p_ppo import V2PPPO

    if isinstance(agent, ImitationPPO):
        return eval_imitation(agent, num_rollouts=num_epochs, ts=ts)
    if isinstance(agent, V2PPPO):
        return eval_tennis(agent, num_steps=(steps_per_epoch or 64) * num_epochs,
                           ts=ts)
    raise TypeError(f"don't know how to evaluate {type(agent)}")


# ---- imitation ----------------------------------------------------------------

def eval_imitation(agent, num_rollouts: int = 5, ts=None,
                   full_episode: bool = True, max_steps: int = 288
                   ) -> Dict[str, float]:
    """Deterministic rollouts of the imitation policy.

    `full_episode=True` (default) plays episodes to the motion's end — not
    a fixed 32-step horizon — rebuilding the context window every
    `context_length` steps exactly like the reference test player
    (`im_player.py:237-247`; full-game eval `common_player.py:29-134`), and
    reports per-episode reward/length, success rate (episode reached the
    motion end rather than a tracking failure) and **MPJPE** — mean
    per-joint position error in meters vs the reference motion — alongside
    the trainer's sub-reward decomposition (`humanoid_smpl_im.py:918-953`)."""
    from vid2player3d_tpu.data import motion_lib as ML
    from vid2player3d_tpu.physics import engine

    env = agent.env
    ts = ts if ts is not None else agent.init_state()
    L = env.cfg.context_length if full_episode else agent.cfg.horizon

    @jax.jit
    def run_segment(env_state, raw_obs, ctx_feat):
        def step_fn(carry, t):
            env_state, raw_obs = carry
            _, _, mu, _, _ = agent._forward(env, ts.params, ts.obs_norm,
                                            raw_obs, ctx_feat, t)
            alive = (env_state.reset_buf == 0).astype(jnp.float32)
            tar = ML.get_motion_state(
                env.lib, env.motion_ids, env_state.motion_times,
                adjust_height=True,
                ground_tolerance=env.cfg.ground_tolerance)
            env_state2, out = env.step(env_state, mu)
            bp, _, _, _ = engine.fk_world(env.model, env_state2.sim)
            # dead/diverging envs can hold non-finite OR finite-but-huge sim
            # states (the env's magnitude latch zeroes obs, not positions);
            # both would poison the mean — mask them out with their own
            # denominator (same 1e3-meter magnitude-latch idea)
            mpjpe = jnp.linalg.norm(bp - tar["rb_pos"], axis=-1).mean(-1)
            m_ok = ((alive > 0) & jnp.isfinite(mpjpe)
                    & (mpjpe < 1e3)).astype(jnp.float32)
            mpjpe = jnp.where(m_ok > 0, mpjpe, 0.0)
            return (env_state2, out.obs), (out.reward, alive, out.sub_rewards,
                                           mpjpe, m_ok, out.done,
                                           out.terminate)

        (env_state, raw_obs), rec = jax.lax.scan(
            step_fn, (env_state, raw_obs), jnp.arange(L))
        return env_state, raw_obs, rec

    n_seg = max(1, (max_steps + L - 1) // L) if full_episode else 1
    keys = jax.random.split(jax.random.PRNGKey(1234), num_rollouts)
    recs = []
    for k in keys:
        env_state, raw_obs, ctx = env.reset_all(k)
        for _ in range(n_seg):
            env_state, raw_obs, rec = run_segment(env_state, raw_obs,
                                                  ctx["feat"])
            recs.append([np.asarray(x) for x in rec])
            if full_episode:
                # context rebuilt between segments (`im_player.py:237-247`)
                ctx = env.init_context(env_state.motion_times)
            if not np.any(recs[-1][1]):
                break   # every env finished its episode

    rew, alive, subs, mpjpe, m_ok, done, term = (
        np.concatenate([r[i] for r in recs]) for i in range(7))
    denom = max(alive.sum(), 1.0)
    done_ct = max(float((done * alive).sum()), 1.0)
    report = {
        "reward_mean": float((rew * alive).sum() / denom),
        "alive_ratio": float(alive.mean()),
        "mpjpe": float(mpjpe.sum() / max(m_ok.sum(), 1.0)),
        "episode_len": float(alive.sum() / (num_rollouts * rew.shape[1])),
        "episode_reward": float((rew * alive).sum()
                                / (num_rollouts * rew.shape[1])),
        # success = reached the motion's end, not a tracking failure
        # (`embodied_pose/run.py:60-90` consecutive-success observer)
        "success_rate": float((done * (1.0 - term) * alive).sum() / done_ct),
    }
    for i, name in enumerate(("r_dof", "r_vel", "r_pos", "r_rot")):
        if i < subs.shape[-1]:
            report[name] = float((subs[..., i] * alive).sum() / denom)
    return report


# ---- tennis --------------------------------------------------------------------

def eval_tennis(agent, num_steps: int = 300, per_env: bool = False, ts=None):
    """Deterministic high-level policy rollout; behavioral stats accumulated
    PER SWING CYCLE like the reference (`mvae_controller_vis.py:81-95`
    updates on recovery transitions): hit rate, estimated bounce-in rate,
    estimated bounce position error (on in-balls), forehand ratio."""
    env = agent.env
    ts = ts if ts is not None else agent.init_state()

    @jax.jit
    def run(state, obs):
        def step_fn(carry, _):
            state, obs = carry
            mu, _ = agent._forward(ts.params, ts.obs_norm, obs)
            state2, out = env.step(state, mu)
            rec = dict(done=out.done,
                       tar_action=state2.tar_action,
                       contact=state2.has_contact,
                       est_in=state2.est_bounce_in,
                       est_err=jnp.linalg.norm(
                           state2.est_bounce_pos
                           - state2.target_bounce[:, :2], axis=-1),
                       swing=state2.mvae.swing_type_cycle,
                       root_pos=state2.sim.root_pos,
                       reward=out.reward)
            return (state2, out.obs), rec

        return jax.lax.scan(step_fn, (state, obs), None, length=num_steps)

    key = jax.random.PRNGKey(4321)
    state0, obs = env.reset_all(key)
    (_, _), rec = run(state0, obs)
    rec = {k: np.asarray(v) for k, v in rec.items()}

    # swing-cycle ends = reaction→recovery transitions (reference
    # `_reset_recovery_buf` rows feed the stat meters, vis.py:81-95)
    ta = rec["tar_action"]                          # (T, N)
    ta_prev = np.concatenate(
        [np.asarray(state0.tar_action)[None], ta[:-1]], axis=0)
    cyc = (ta_prev == 1) & (ta == 0) & (rec["done"] == 0)
    # a terminated reaction with no contact is also a finished (missed) cycle
    cyc |= (rec["done"] == 1) & (ta_prev == 1)

    def cyc_rate(x, mask=cyc):
        m = mask.astype(np.float64)
        return (x * m).sum(0) / np.maximum(m.sum(0), 1e-9), m.sum(0)

    hit_pe, n_cyc = cyc_rate(rec["contact"])
    in_pe, _ = cyc_rate(rec["est_in"])
    fh_pe, _ = cyc_rate(rec["swing"] == 1)
    err_mask = cyc & rec["est_in"].astype(bool)
    err_pe, n_in = cyc_rate(rec["est_err"], err_mask)
    dist_pe = np.linalg.norm(
        np.diff(rec["root_pos"][..., :2], axis=0), axis=-1).sum(0)

    valid = n_cyc > 0
    stats_pe = dict(hit_rate=hit_pe, bounce_in_rate=in_pe, fh_ratio=fh_pe,
                    bounce_pos_error=err_pe, cycles=n_cyc, distance=dist_pe)
    report = {
        "cycles": int(n_cyc.sum()),
        "hit_rate": float(hit_pe[valid].mean()) if valid.any() else 0.0,
        "bounce_in_rate": float(in_pe[valid].mean()) if valid.any() else 0.0,
        # None (JSON null), not NaN: "no in-balls recorded" must stay valid
        # strict JSON in reports
        "bounce_pos_error": float(err_pe[n_in > 0].mean())
            if (n_in > 0).any() else None,
        "fh_ratio": float(fh_pe[valid].mean()) if valid.any() else 0.0,
        "reward_mean": float(rec["reward"].mean()),
    }
    # dual rally: break the pooled stats out PER LANE (even = player A /
    # near, odd = player B / far — `envs/tennis_dual.py` lane parity). The
    # two identities run different MVAEs/handedness/π_low, so the artifact
    # must show they BEHAVE differently (VERDICT r04 next #5); pooled
    # numbers can't.
    if getattr(env, "_lane", None) is not None:
        lane = np.asarray(env._lane)
        for name, m in (("lane_a", lane == 0), ("lane_b", lane == 1)):
            v = valid & m
            report[name] = {
                "cycles": int(n_cyc[m].sum()),
                "hit_rate": float(hit_pe[v].mean()) if v.any() else 0.0,
                "bounce_in_rate": float(in_pe[v].mean()) if v.any() else 0.0,
                "fh_ratio": float(fh_pe[v].mean()) if v.any() else 0.0,
                "bounce_pos_error": float(err_pe[m & (n_in > 0)].mean())
                    if (m & (n_in > 0)).any() else None,
            }
    if per_env:
        return report, stats_pe
    return report


def select_best(stats_pe: Dict[str, np.ndarray], num: int = 1,
                bounce_in_min: float = 0.95, fh_max: float = 0.6
                ) -> np.ndarray:
    """Rank envs for recording (`mvae_controller_vis.py:149-156`): keep envs
    with bounce-in rate > 0.95 and forehand ratio < 0.6, sorted by total
    root distance traveled, descending. Falls back to all envs by distance
    when no env qualifies."""
    cand = (stats_pe["bounce_in_rate"] > bounce_in_min) \
        & (stats_pe["fh_ratio"] < fh_max) & (stats_pe["cycles"] > 0)
    ids = np.nonzero(cand)[0]
    if ids.size == 0:
        ids = np.arange(len(stats_pe["distance"]))
    order = np.argsort(-stats_pe["distance"][ids])
    return ids[order][:num]


# ---- rollout export --------------------------------------------------------------

def export_imitation_rollout(agent, path: str, num_steps: int = 90,
                             ts=None) -> str:
    """Dump a deterministic imitation rollout: simulated body positions plus
    the reference-motion target as a ghost skeleton — the data behind the
    reference's side-by-side mujoco visualizer
    (`embodied_pose/env/tasks/humanoid_smpl_im_vis.py:72-155`). Renderable
    with `vis.render_html` (ref ghost drawn in a second color)."""
    from vid2player3d_tpu.data import motion_lib as ML
    from vid2player3d_tpu.learn.ppo import ImitationPPO
    from vid2player3d_tpu.physics import engine

    if not isinstance(agent, ImitationPPO):
        raise TypeError("imitation rollout export needs an ImitationPPO")
    env = agent.env
    ts = ts if ts is not None else agent.init_state()

    L = env.cfg.context_length

    @jax.jit
    def run_segment(env_state, raw_obs, ctx_feat):
        """One context window's worth of steps; the context is re-built
        between segments like the test player (`im_player.py:237-247`)."""

        def step_fn(carry, t):
            env_state, raw_obs = carry
            _, _, mu, _, _ = agent._forward(env, ts.params, ts.obs_norm,
                                            raw_obs, ctx_feat, t)
            tar = ML.get_motion_state(
                env.lib, env.motion_ids, env_state.motion_times,
                adjust_height=True,
                ground_tolerance=env.cfg.ground_tolerance)
            env_state2, out = env.step(env_state, mu)
            bp, _, _, _ = engine.fk_world(env.model, env_state2.sim)
            rec = dict(body_pos=bp, ref_body_pos=tar["rb_pos"],
                       done=out.done)
            return (env_state2, out.obs), rec

        return jax.lax.scan(step_fn, (env_state, raw_obs), jnp.arange(L))

    env_state, raw_obs, ctx = env.reset_all(jax.random.PRNGKey(11))
    chunks = []
    for _ in range(max(1, (num_steps + L - 1) // L)):
        (env_state, raw_obs), rec = run_segment(env_state, raw_obs,
                                                ctx["feat"])
        chunks.append({k: np.asarray(v) for k, v in rec.items()})
        ctx = env.init_context(env_state.motion_times)
    rec = {k: np.concatenate([c[k] for c in chunks], 0)[:num_steps]
           for k in chunks[0]}
    rec["body_radius"] = np.asarray(env.model.contact_radius[0, :24])
    np.savez_compressed(path, **rec)
    return path


def export_rollout(agent, path: str, num_steps: int = 150, ts=None) -> str:
    """Dump a deterministic rollout as npz for offline visualization
    (per-frame kinematics — the reference's vis stack renders exactly these
    quantities via smpl_visualizer, `mvae_controller_vis.py:97-242`)."""
    from vid2player3d_tpu.learn.v2p_ppo import V2PPPO

    if not isinstance(agent, V2PPPO):
        raise TypeError("rollout export currently targets tennis agents")
    env = agent.env
    ts = ts if ts is not None else agent.init_state()

    @jax.jit
    def run(state, obs):
        def step_fn(carry, _):
            state, obs = carry
            mu, _ = agent._forward(ts.params, ts.obs_norm, obs)
            state2, out = env.step(state, mu)
            from vid2player3d_tpu.physics import engine
            bp, _, _, _ = engine.fk_world(env.model, state2.sim)
            rec = dict(root_pos=state2.mvae.root_pos,
                       joint_rotmat=state2.mvae.joint_rotmat,
                       phase=state2.mvae.phase_pred,
                       swing=state2.mvae.swing_type,
                       ball_pos=state2.ball_pos,
                       racket_pos=state2.racket_pos,
                       racket_normal=state2.racket_normal,
                       sim_root_pos=state2.sim.root_pos,
                       sim_root_quat=state2.sim.root_quat,
                       sim_joint_quat=state2.sim.joint_quat,
                       body_pos=bp,
                       done=out.done,
                       contact=state2.has_contact,
                       bounce_in=state2.bounce_in)
            return (state2, out.obs), rec

        return jax.lax.scan(step_fn, (state, obs), None, length=num_steps)

    state, obs = env.reset_all(jax.random.PRNGKey(7))
    _, rec = run(state, obs)
    rec = {k: np.asarray(v) for k, v in rec.items()}
    # static viewer extras: per-body geom radii (volumetric limbs) and the
    # racket-hand wrist (handle line)
    rec["body_radius"] = np.asarray(env.model.contact_radius[0, :24])
    rec["wrist_id"] = np.asarray(env.wrist_id)

    if env.any_two_hand:
        # post-hoc two-hand refinement of the recorded kinematics — the
        # reference's `fix_two_hand_backhand_post` applied at render time
        # (`mvae_controller_vis.py:181-190`, mask swing==2 & 2<phase<5) with
        # the batch-mode optimizer weights (`humanoid_smpl_im_mvae.py:975-980`).
        # The in-step fix already ran at few iterations; this polishes the
        # exported frames at full iteration count. Per lane: only two-handed
        # lanes refine, each with its own handedness.
        from vid2player3d_tpu.tennis import twohand

        T, N = rec["phase"].shape
        mask = (rec["swing"] == 2) & (rec["phase"] > 2.0) & (rec["phase"] < 5.0)
        mask &= np.asarray(env.two_hand_mask)[None]
        rest = np.broadcast_to(np.asarray(env.rest_joints_smpl)[None],
                               (T, N, 24, 3)).reshape(T * N, 24, 3)
        rh_env = np.broadcast_to(np.asarray(env.righthand)[None], (T, N))
        rm = jnp.asarray(rec["joint_rotmat"].reshape(T * N, 24, 3, 3))
        for rh in sorted({bool(sp.righthand)
                          for l, sp in enumerate(env._lane_specs)
                          if env._lane_two_hand_flag(l)}):
            m = mask & (rh_env == rh)
            rm = twohand.optimize_two_hand_backhand(
                rm, jnp.asarray(rest), righthand=rh, iters=50,
                mask=jnp.asarray(m.reshape(T * N)))
        rec["joint_rotmat"] = np.asarray(rm).reshape(T, N, 24, 3, 3)

    np.savez_compressed(path, **rec)
    return path
