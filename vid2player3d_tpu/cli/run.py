"""Training / evaluation entry point (reference `embodied_pose/run.py` +
`vid2player/run.py` + `motion_vae/train.py`, unified).

    python -m vid2player3d_tpu --cfg amass_im [--num_envs N] [--epochs E]
        [--seed S] [--checkpoint PATH] [--motion_file PATH] [--out DIR]
        [--n_devices D] [--test]

Training writes `metrics.jsonl` (one JSON line per epoch — the TPU-native
replacement for the reference's tensorboard `SummaryWriter`) and periodic
`latest.npz` / `best.npz` checkpoints into `--out`.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time
from typing import Optional


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="vid2player3d_tpu",
                                description=__doc__.split("\n")[0])
    p.add_argument("--cfg", required=True, help="named config (see cli.configs)")
    p.add_argument("--test", action="store_true",
                   help="evaluation mode: deterministic rollouts + metrics")
    p.add_argument("--num_envs", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--horizon", type=int, default=None)
    p.add_argument("--minibatch_size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None,
                   help="override the config's learning rate")
    p.add_argument("--lr_schedule", default=None,
                   choices=("constant", "adaptive", "linear"))
    p.add_argument("--lr_decay_epochs", type=int, default=None,
                   help="linear lr schedule: epochs to reach lr_min_frac")
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint to load (overrides the config's warm start)")
    p.add_argument("--pi_low_checkpoint", default=None,
                   help="trained low-level imitation checkpoint to embed in "
                        "tennis configs (default: <out>/<player>_im/best.npz "
                        "when present; otherwise PD-only fallback)")
    p.add_argument("--motion_file", default=None,
                   help="MotionLib .npz for imitation configs (default: synthetic)")
    p.add_argument("--out", default="results",
                   help="output dir for checkpoints + metrics.jsonl")
    p.add_argument("--n_devices", type=int, default=None,
                   help="data-parallel mesh size (default: no mesh)")
    p.add_argument("--save_every", type=int, default=50)
    p.add_argument("--render", default=None, metavar="OUT.html",
                   help="with --test: export a rollout and write a "
                        "standalone HTML viewer (reference video/scenepic "
                        "export, mvae_controller_vis.py:97-242)")
    p.add_argument("--select_best", action="store_true",
                   help="with --render: rank envs by behavioral stats and "
                        "record the best (mvae_controller_vis.py:149-156)")
    p.add_argument("--mvae_batches", type=int, default=None,
                   help="mvae configs: batches per epoch (default "
                        "nseqs/batch_size)")
    p.add_argument("--dataset_dir", default=None,
                   help="mvae configs: train on a video-format dataset "
                        "(manifest.json + npy) instead of the synthetic "
                        "fixture; generate one with "
                        "`python -m vid2player3d_tpu.data.tennis_motion`")
    p.add_argument("--pre_run", action="store_true",
                   help="mvae configs: 5-epoch smoke train + random-walk "
                        "rollout metrics (reference motion_vae/train.py:31-36)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of training epochs "
                        "2-4 into DIR (view with xprof/tensorboard)")
    return p


class MetricsLogger:
    """One JSON line per epoch; console summary with fps + ETA (reference
    `im_agent.py:211-218` console lines, `common_agent.py:541-554` tb logs)."""

    def __init__(self, out_dir: str, max_epochs: int):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self.t0 = time.time()
        self.max_epochs = max_epochs
        self._ema_dt = None     # per-epoch pace, compile epoch excluded
        self._last_wall = 0.0

    def log(self, epoch: int, metrics: dict, env_steps: int) -> None:
        row = {"epoch": epoch,
               **{k: float(v) for k, v in metrics.items()},
               "wall_s": round(time.time() - self.t0, 2)}
        self._f.write(json.dumps(row) + "\n")
        self._f.flush()
        # fps/ETA from recent per-epoch deltas (EMA), not the cumulative
        # mean — the first epoch carries the multi-minute XLA compile and
        # otherwise skews the console numbers ~10x for hundreds of epochs
        dt_step = row["wall_s"] - self._last_wall
        self._last_wall = row["wall_s"]
        if epoch > 1:
            self._ema_dt = dt_step if self._ema_dt is None \
                else 0.9 * self._ema_dt + 0.1 * dt_step
        dt = self._ema_dt if self._ema_dt is not None else dt_step
        fps = env_steps / max(dt, 1e-6)
        eta = dt * (self.max_epochs - epoch)
        print(f"epoch {epoch}/{self.max_epochs} "
              f"reward {row.get('reward_mean', float('nan')):.4f} "
              f"fps {fps:,.0f} eta {eta / 60:.1f}m", flush=True)


def _clamp_minibatch(cfg, num_envs):
    """Scaled-down runs (--num_envs below the config's production scale)
    keep working: the minibatch can never exceed the rollout batch and must
    divide it."""
    nbatch = num_envs * cfg.horizon
    mb = min(cfg.minibatch_size, nbatch)
    while nbatch % mb:
        mb -= 1
    if mb != cfg.minibatch_size:
        cfg = dataclasses.replace(cfg, minibatch_size=mb)
    return cfg


def _mesh(args):
    if args.n_devices is None:
        return None
    from vid2player3d_tpu import parallel

    parallel.initialize_distributed()
    return parallel.data_parallel_mesh(args.n_devices)


def _build_im(run_cfg, args):
    from vid2player3d_tpu.data.motion_lib import MotionLib
    from vid2player3d_tpu.data.synthetic import make_synthetic_motion_lib
    from vid2player3d_tpu.envs import HumanoidImEnv
    from vid2player3d_tpu.learn import ImitationPPO

    env_cfg, ppo_cfg = run_cfg.env_im, run_cfg.ppo
    if args.num_envs:
        env_cfg = dataclasses.replace(env_cfg, num_envs=args.num_envs)
    for f, dst in (("horizon", "horizon"), ("minibatch_size", "minibatch_size"),
                   ("lr", "learning_rate"), ("lr_schedule", "lr_schedule"),
                   ("lr_decay_epochs", "lr_decay_epochs")):
        if getattr(args, f):
            ppo_cfg = dataclasses.replace(ppo_cfg, **{dst: getattr(args, f)})
    ppo_cfg = _clamp_minibatch(ppo_cfg, env_cfg.num_envs)
    if args.motion_file:
        lib = MotionLib.load(args.motion_file)
    else:
        print("NOTE: no --motion_file; using synthetic motions (the reference "
              "ships no AMASS data either, README.md:83)")
        lib = make_synthetic_motion_lib(num_motions=8, T=120, fps=30.0,
                                        seed=run_cfg.seed)
    mesh = _mesh(args)
    env = HumanoidImEnv(env_cfg, lib, rng=args.seed or run_cfg.seed)
    if mesh is not None:
        env = env.shard(mesh)
    agent = ImitationPPO(env, ppo_cfg, seed=args.seed or run_cfg.seed,
                         mesh=mesh)
    return agent


def _build_tennis(run_cfg, args):
    import jax
    import numpy as np

    from vid2player3d_tpu.envs import TennisEnv
    from vid2player3d_tpu.learn import V2PPPO
    from vid2player3d_tpu.tennis import player as P
    from vid2player3d_tpu.tennis.ball import TennisBallGenerator

    env_cfg, v2p_cfg = run_cfg.env_tennis, run_cfg.v2p
    if args.num_envs:
        env_cfg = dataclasses.replace(env_cfg, num_envs=args.num_envs)
    for f, dst in (("horizon", "horizon"), ("minibatch_size", "minibatch_size"),
                   ("lr", "learning_rate"), ("lr_schedule", "lr_schedule"),
                   ("lr_decay_epochs", "lr_decay_epochs")):
        if getattr(args, f):
            v2p_cfg = dataclasses.replace(v2p_cfg, **{dst: getattr(args, f)})
    v2p_cfg = _clamp_minibatch(v2p_cfg, env_cfg.num_envs)

    seed = args.seed or run_cfg.seed

    # incoming-ball pool honors the config's bounce box (stage-1a narrows
    # ball_bounce_x_half for the strike-first curriculum)
    bx = env_cfg.ball_bounce_x_half
    gen_cfg = None if bx >= 3.0 else {
        "bounce_min": [-bx, -10.0, 0.0], "bounce_max": [bx, -7.0, 0.0]}

    def load_player(name, fallback_key):
        sp, ft = _load_mvae_spec(os.path.join(args.out, f"mvae_{name}"),
                                 name, seed + fallback_key)
        if args.test:
            # test-time players gate policy residuals to fh/bh swing phases
            # (`mvae_player.py:301-419` is_train branch) — evaluation must
            # run the eval-mode spec, not the training-time semantics
            sp = dataclasses.replace(sp, is_train=False)
        if ft is None:
            # no trained MVAE: synthetic init-condition frames
            rng = np.random.default_rng(seed + fallback_key)
            ft = (rng.standard_normal((64, P.FRAME_SIZE)) * 0.05
                  ).astype(np.float32)
            ft[:, 2] = 0.95
        return sp, ft

    spec, feats = load_player(run_cfg.player, 0)

    # frozen low-level policy: the defining vid2player nesting — the trained
    # imitation policy physically tracks the MVAE kinematic targets
    # (`player_builder.py:184-206`, `im_player.py:187-202`)
    pi_low, pi_low_params = _load_pi_low(run_cfg, args)

    mesh = _mesh(args)
    if run_cfg.dual:
        from vid2player3d_tpu.envs.tennis_dual import DualTennisEnv

        # TWO player identities: per-lane MVAE spec + init frames + frozen
        # π_low + handedness + two-hand flag (`mvae_player.py:33-40`,
        # `im_player.py:54-90`, `federer_djokovic.yaml:65`)
        player_b = run_cfg.player_b or run_cfg.player
        spec_b, feats_b = load_player(player_b, 1)
        pi_low_b, pi_low_params_b = _load_pi_low(
            dataclasses.replace(run_cfg, player=player_b), args)
        two_handed = ("djokovic", "nadal")
        env = DualTennisEnv(
            env_cfg, (spec, spec_b), (feats, feats_b),
            ball_generator=TennisBallGenerator(gen_cfg),
            pi_low=pi_low, pi_low_params=pi_low_params,
            pi_low_b=pi_low_b, pi_low_params_b=pi_low_params_b,
            two_hand_lanes=(run_cfg.player in two_handed,
                            player_b in two_handed))
        # one net per player identity, lane-routed (im_network_builder_dual)
        v2p_cfg = dataclasses.replace(v2p_cfg, num_policies=2)
    else:
        env = TennisEnv(env_cfg, spec, feats,
                        ball_generator=TennisBallGenerator(gen_cfg),
                        pi_low=pi_low, pi_low_params=pi_low_params)
    if mesh is not None:
        env = env.shard(mesh)
    agent = V2PPPO(env, v2p_cfg, seed=seed, mesh=mesh)
    return agent


def _load_pi_low(run_cfg, args):
    """Resolve the embedded low-level imitation checkpoint: explicit
    `--pi_low_checkpoint` wins, else the player's `<player>_im` training
    output under `--out` (the analog of the `tennis_im.yaml` pretrained
    checkpoint path the reference's PlayerBuilder loads)."""
    from vid2player3d_tpu.learn import FrozenImitator

    path = args.pi_low_checkpoint
    if path is None:
        for name in (f"{run_cfg.player}_im", "djokovic_im", "amass_im"):
            for f in ("best.npz", "latest.npz"):
                cand = os.path.join(args.out, name, f)
                if os.path.exists(cand):
                    path = cand
                    break
            if path:
                break
    if path is None:
        print("NOTE: no low-level imitation checkpoint found; tennis physics "
              "falls back to PD-only tracking of the MVAE targets")
        return None, None
    print(f"embedding frozen low-level policy from {path}")
    frozen = FrozenImitator.from_checkpoint(path)
    return frozen.as_pi_low()


def _load_mvae_spec(mvae_dir: str, player: str, seed: int):
    """Use a trained MVAE checkpoint when present, otherwise a random spec
    (the reference demo likewise cannot ship trained MVAEs, README.md:13).
    Returns (spec, init_condition_frames-or-None); with a trained MVAE the
    init conditions are RAW DATASET FRAMES like the reference
    (`mvae_player.py:112-158` loads init conditions from the dataset)."""
    import jax
    import numpy as np

    from vid2player3d_tpu.tennis import player as P

    meta = os.path.join(mvae_dir, "latest.npz")
    if os.path.exists(meta):
        from vid2player3d_tpu.mvae import MVAEOption, MVAETrainer, \
            make_synthetic_pose_dataset

        opt = MVAEOption.load(player)
        opt.checkpoint_dir = os.path.dirname(mvae_dir) or "."
        opt.model_ver = os.path.basename(mvae_dir)
        ds = make_synthetic_pose_dataset(opt)
        tr = MVAETrainer(opt, ds)
        tr.load_checkpoint("latest")
        # real dataset frames saved with the checkpoint win over the
        # placeholder dataset's frames (`mvae_player.py:112-158` loads init
        # conditions from the player's dataset)
        init_path = os.path.join(mvae_dir, "init_frames.npy")
        init = np.load(init_path) if os.path.exists(init_path) \
            else ds.raw_init_frames(64)
        return P.spec_from_trainer(
            tr, player=player,
            righthand=(player != "nadal")), init   # nadal plays left-handed
    print(f"NOTE: no trained MVAE at {meta}; using a random spec")
    spec = P.make_random_spec(jax.random.PRNGKey(seed), player=player)
    if player == "nadal":
        spec = dataclasses.replace(spec, righthand=False)
    return spec, None


def _train_loop(agent, run_cfg, args, logger, ts0=None):
    best = float("-inf")
    ts = ts0 if ts0 is not None else agent.init_state()
    env_steps = agent.env.cfg.num_envs * agent.cfg.horizon
    epochs = args.epochs or run_cfg.max_epochs
    for e in range(1, epochs + 1):
        # per-phase device profiling (SURVEY §5.1): trace epochs 2-4 (after
        # the compile epoch) so the capture holds steady-state step timing
        if args.profile and e == 2:
            import jax

            jax.profiler.start_trace(args.profile)
        ts, metrics = agent.train_epoch(ts)
        if args.profile and e == 4:
            import jax

            jax.block_until_ready(metrics)
            jax.profiler.stop_trace()
            print(f"profiler trace written to {args.profile}")
        logger.log(e, metrics, env_steps)
        r = float(metrics.get("reward_mean", 0.0))
        if e % args.save_every == 0 or e == epochs:
            agent.save_checkpoint(os.path.join(args.out, "latest.npz"), ts)
        if r > best:
            best = r
            agent.save_checkpoint(os.path.join(args.out, "best.npz"), ts)
    return ts


def _eval_loop(agent, run_cfg, args, ts=None):
    """Deterministic evaluation: report reward / behavioral stats
    (reference `--test` players, `mvae_controller_vis.py:81-95`); with
    --render also produce a watchable standalone HTML rollout."""
    from vid2player3d_tpu.eval import evaluate

    report = evaluate(agent, num_epochs=args.epochs or 5, ts=ts)
    print(json.dumps(report, indent=2))

    if args.render:
        import numpy as np

        from vid2player3d_tpu.eval import (eval_tennis,
                                           export_imitation_rollout,
                                           export_rollout, select_best)
        from vid2player3d_tpu.learn import V2PPPO
        from vid2player3d_tpu.vis import render_html

        npz = os.path.splitext(args.render)[0] + ".npz"
        if isinstance(agent, V2PPPO):
            export_rollout(agent, npz, ts=ts)
            env_ids = None
            if args.select_best:
                _, stats_pe = eval_tennis(agent, per_env=True, ts=ts)
                env_ids = select_best(stats_pe, num=4)
                print(f"select_best env ids: {np.asarray(env_ids).tolist()}")
            render_html(npz, args.render, env_ids=env_ids,
                        dual=run_cfg.dual)
        else:
            # imitation: simulated skeleton + reference ghost, the
            # side-by-side vis (`humanoid_smpl_im_vis.py:72-155`)
            export_imitation_rollout(agent, npz, ts=ts)
            render_html(npz, args.render)
        print(f"wrote {args.render}")
    return report


def main(argv: Optional[list] = None) -> int:
    args = build_parser().parse_args(argv)
    # persistent compilation cache: repeat CLI invocations (curriculum
    # stages, resumes) skip the multi-minute first compile
    from vid2player3d_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    from vid2player3d_tpu.cli.configs import get_config

    run_cfg = get_config(args.cfg)
    os.makedirs(args.out, exist_ok=True)

    if run_cfg.kind == "mvae":
        from vid2player3d_tpu.mvae import MVAEOption, MVAETrainer, \
            make_synthetic_pose_dataset

        from vid2player3d_tpu.mvae.eval import report_for_trainer

        opt = MVAEOption.load(run_cfg.mvae_version)
        if args.seed is not None:
            opt.seed = args.seed
        if args.pre_run:
            # smoke scale: 5 epochs over 1000 seqs (`train.py:31-36`)
            opt.nseqs = min(opt.nseqs, 1000)
        # checkpoints land at <out>/mvae_<player>/latest.npz — the location
        # `_load_mvae_spec` searches when building tennis configs
        opt.checkpoint_dir = args.out
        opt.model_ver = f"mvae_{run_cfg.player}"
        if args.dataset_dir:
            # the real-data path (`Video3DPoseDataset`, reference
            # `motion_vae/base.py:23-111`): manifest + npy layout, phase
            # labels from hit keyframes
            from vid2player3d_tpu.mvae.dataset import load_video_dataset

            ds = load_video_dataset(opt, args.dataset_dir)
            print(f"dataset: {args.dataset_dir} "
                  f"({len(ds.rollouts)} rollout windows)")
        else:
            ds = make_synthetic_pose_dataset(opt)
        trainer = MVAETrainer(opt, ds)
        if args.test:
            # random-walk rollout harness for a trained MVAE (reference
            # `motion_vae/test.py:16-80`)
            trainer.load_checkpoint("latest")
            print(json.dumps(report_for_trainer(trainer), indent=2))
            return 0
        epochs = args.epochs or (opt.n_epochs + opt.n_epochs_decay)
        if args.pre_run and not args.epochs:
            # 5-epoch smoke + rollout metrics (`train.py:31-36 --pre_run`);
            # an explicit --epochs wins
            epochs = 5
        logger = MetricsLogger(args.out, epochs)
        for e in range(1, epochs + 1):
            m = trainer.train_epoch(batches_per_epoch=args.mvae_batches)
            logger.log(e, m, 0)
            if e % args.save_every == 0 or e == epochs:
                trainer.save_checkpoint("latest")
        print(json.dumps(report_for_trainer(trainer, num_steps=120), indent=2))
        return 0

    agent = _build_im(run_cfg, args) if run_cfg.kind == "im" \
        else _build_tennis(run_cfg, args)

    ck = args.checkpoint
    if ck is None and run_cfg.warm_start:
        cand = os.path.join(args.out, run_cfg.warm_start, "best.npz")
        ck = cand if os.path.exists(cand) else None
    ts0 = None
    if ck:
        if run_cfg.kind == "im":
            ts0 = agent.load_checkpoint(ck)
        else:
            ts0 = agent.load_stage_checkpoint(
                ck, discard_sigma=run_cfg.discard_pretrained_sigma)

    if args.test:
        _eval_loop(agent, run_cfg, args, ts=ts0)
        return 0

    logger = MetricsLogger(args.out, args.epochs or run_cfg.max_epochs)
    _train_loop(agent, run_cfg, args, logger, ts0=ts0)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
