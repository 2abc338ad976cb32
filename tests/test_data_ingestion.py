"""Real-data ingestion proofs (VERDICT round-1 item 8).

(a) AMASS-format npz fixture → `convert_amass_dir` → MotionLib → one
    imitation training epoch (end-to-end, reference
    `uhc/utils/convert_amass_isaac.py:95-176`).
(b) manifest.json + mmapped-npy video dataset → `load_video_dataset` with
    video/player/side/handness filtering → one MVAE training epoch
    (reference `vid2player/motion_vae/dataset.py:13-110`).
"""

import os

import numpy as np
import pytest


# ---- (a) AMASS fixture ------------------------------------------------------

def _write_amass_fixture(d, n_files=2, T=90, fps=60.0):
    """Realistic AMASS npz layout: poses (T,156) SMPLH, trans, betas (16),
    gender, mocap_framerate."""
    rng = np.random.default_rng(0)
    for i in range(n_files):
        poses = np.zeros((T, 156), np.float32)
        t = np.arange(T)[:, None] / fps
        # gentle joint wiggles + slow root yaw
        poses[:, 3:66] = 0.25 * np.sin(
            2 * np.pi * rng.uniform(0.3, 1.0, (1, 63)) * t
            + rng.uniform(0, 6.28, (1, 63)))
        poses[:, 2] = 0.2 * np.sin(2 * np.pi * 0.2 * t[:, 0])
        trans = np.stack([0.5 * t[:, 0], 0.1 * np.sin(t[:, 0]),
                          np.full(T, 0.0)], 1).astype(np.float32)
        np.savez(os.path.join(d, f"seq_{i}.npz"),
                 poses=poses, trans=trans,
                 betas=rng.uniform(-1, 1, 16).astype(np.float32),
                 gender="male" if i % 2 else "neutral",
                 mocap_framerate=np.float64(fps))


@pytest.mark.slow
def test_amass_convert_to_motionlib_and_train(tmp_path):
    import jax

    from vid2player3d_tpu.core import smpl as S
    from vid2player3d_tpu.data.amass import convert_amass_dir
    from vid2player3d_tpu.data.motion_lib import MotionLib, get_motion_state
    from vid2player3d_tpu.envs import HumanoidImConfig, HumanoidImEnv
    from vid2player3d_tpu.learn import ImitationPPO, PPOConfig

    d = os.path.join(tmp_path, "amass")
    os.makedirs(d)
    _write_amass_fixture(d)
    out = os.path.join(tmp_path, "lib.npz")
    lib = convert_amass_dir(d, smpl_model=S.make_synthetic_smpl(),
                            out_path=out)
    assert lib.num_motions == 2
    # downsampled 60 → 30 fps
    assert abs(float(lib.motion_dt[0]) - 1.0 / 30.0) < 1e-5

    # round-trips through the on-disk format
    lib2 = MotionLib.load(out)
    assert lib2.num_motions == 2
    st = get_motion_state(lib2, np.array([0, 1]), np.array([0.5, 0.7]))
    for k in ("root_pos", "dof_pos", "rb_pos"):
        assert np.all(np.isfinite(np.asarray(st[k])))

    # trains end to end
    env = HumanoidImEnv(HumanoidImConfig(num_envs=4, substeps=2), lib2, rng=0)
    agent = ImitationPPO(env, PPOConfig(horizon=4, minibatch_size=8,
                                        mini_epochs=1), seed=3)
    ts = agent.init_state()
    ts, m = agent.train_epoch(ts)
    assert np.isfinite(float(m["a_loss"]))
    assert float(m["reward_mean"]) > 0.0


# ---- (b) video manifest dataset ---------------------------------------------

def _make_seq_arrays(T, seed):
    from vid2player3d_tpu.core import rot as R

    rng = np.random.default_rng(seed)
    t = np.arange(T)[:, None, None] / 30.0
    jp = 0.3 * np.sin(2 * np.pi * rng.uniform(0.5, 2, (1, 24, 3)) * t)
    jp[:, 0, 1] += 0.9
    aa = 0.4 * np.sin(2 * np.pi * rng.uniform(0.5, 2, (1, 24, 3)) * t)
    rm = np.asarray(R.angle_axis_to_rotmat(aa.reshape(-1, 3))).reshape(
        T, 24, 3, 3)
    return {"joint_pos": jp.astype(np.float32),
            "joint_rotmat": rm.astype(np.float32)}


def _write_video_fixture(d):
    from vid2player3d_tpu.mvae import write_video_dataset

    T = 80
    kfs = [{"fid": f, "fg": i % 2 == 0} for i, f in enumerate(range(2, T, 20))]
    videos = [
        {"name": "vid_a", "background": "usopen", "gender": "m",
         "is_orig": True,
         "points_annotation": [{"keyframes": kfs}],
         "sequences": {"fg": [
             {"start": 0, "player": "Federer", "handness": "right",
              "beta": [0.0] * 10, "point_idx": 0,
              "arrays": _make_seq_arrays(T, 1)}],
             "bg": [
             {"start": 0, "player": "Nadal", "handness": "left",
              "beta": [0.0] * 10, "point_idx": 0,
              "arrays": _make_seq_arrays(T, 2)}]}},
        {"name": "vid_b", "background": "wimbledon", "gender": "m",
         "is_orig": False, "points_annotation": [],
         "sequences": {"fg": [
             {"start": 0, "player": "Djokovic", "handness": "right",
              "beta": [0.0] * 10, "point_idx": 0,
              "arrays": _make_seq_arrays(T, 3)}], "bg": []}},
    ]
    write_video_dataset(d, videos)


def test_video_manifest_filtering_and_mvae_train(tmp_path):
    from vid2player3d_tpu.mvae import (MVAEOption, MVAETrainer,
                                       load_video_dataset)

    d = os.path.join(tmp_path, "video")
    _write_video_fixture(d)

    # player-name filter: only Federer's fg sequence survives
    opt = MVAEOption(player_name=["Federer"], side="fg", predict_phase=True,
                     nframes_seq=8, batch_size=8, hidden_size=32,
                     num_experts=2, latent_size=8)
    ds = load_video_dataset(opt, d)
    assert len(ds.seq_bounds) == 1

    # handness filter beats player filter (reference precedence)
    opt_l = MVAEOption(player_handness=["left"], side="both",
                       nframes_seq=8)
    ds_l = load_video_dataset(opt_l, d)
    assert len(ds_l.seq_bounds) == 1

    # background filter
    opt_b = MVAEOption(background=["wimbledon"], side="fg", nframes_seq=8)
    ds_b = load_video_dataset(opt_b, d)
    assert len(ds_b.seq_bounds) == 1

    # phase labels wired through (sin²+cos² = 1 on valid rows)
    sc = ds.phase_arr[ds.valid_arr]
    assert np.allclose((sc ** 2).sum(-1), 1.0, atol=1e-5)

    # one (truncated) MVAE training epoch on the filtered dataset
    tr = MVAETrainer(opt, ds)
    m = tr.train_epoch(batches_per_epoch=2)
    assert np.isfinite(float(m["recon"]))


def test_motion_lib_kp2d_metadata_roundtrip(tmp_path):
    """Optional kp2d/camera metadata (reference `motion_lib.py:277-386`)
    persists through save/load and defaults to empty."""
    from vid2player3d_tpu.data.synthetic import make_synthetic_motion_lib

    lib = make_synthetic_motion_lib(num_motions=2, T=30, fps=30.0, seed=0)
    assert not lib.has_kp2d
    import dataclasses as dc

    import jax.numpy as jnp

    F = lib.gts.shape[0]
    lib2 = dc.replace(lib, kp2d=jnp.ones((F, 24, 3)),
                      cam_extrinsics=jnp.tile(jnp.eye(4), (2, 1, 1)))
    assert lib2.has_kp2d
    p = os.path.join(tmp_path, "lib_kp.npz")
    lib2.save(p)
    from vid2player3d_tpu.data.motion_lib import MotionLib

    lib3 = MotionLib.load(p)
    assert lib3.has_kp2d and lib3.kp2d.shape == (F, 24, 3)
    assert lib3.cam_extrinsics.shape == (2, 4, 4)
