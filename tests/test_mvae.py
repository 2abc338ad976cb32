"""MotionVAE: config registry, dataset assembly, training, checkpoints."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vid2player3d_tpu.mvae import (MVAEOption, MVAETrainer,
                                   PoseSequenceDataset,
                                   make_synthetic_pose_dataset,
                                   phase_from_hits)
from vid2player3d_tpu.utils import checkpoint as ckpt


def tiny_opt(**kw):
    opt = MVAEOption(latent_size=8, hidden_size=32, num_experts=3,
                     nframes_seq=6, batch_size=8, predict_phase=True,
                     curriculum_schedule=(0.0, 0.5), n_epochs=4,
                     n_epochs_decay=4, lr=3e-4)
    for k, v in kw.items():
        setattr(opt, k, v)
    return opt


def test_config_registry_inheritance():
    opt = MVAEOption.load("djokovic")
    assert opt.player_name == ["Djokovic"]
    # inherited from federer base
    assert opt.frame_size == 6 + 24 * 6 + 23 * 3 + 23 * 3 == 288
    assert opt.predict_phase and opt.softmax_future
    assert MVAEOption().resolved_frame_size() == 288


def test_phase_from_hits():
    sincos, rad, valid = phase_from_hits(10, [(1, True), (5, False), (9, True)])
    assert valid[1] and valid[8] and not valid[0] and not valid[9]
    # frame 1 starts a recovery (this player just hit): phase = 1 -> sin=0
    assert np.isclose(rad[1], np.pi)
    # frame 5: opponent hit, reaction phase starts at 0
    assert np.isclose(rad[5], 0.0)
    assert np.allclose(np.linalg.norm(sincos[valid], axis=1), 1.0, atol=1e-6)


def test_dataset_features_and_windows():
    opt = tiny_opt()
    ds = make_synthetic_pose_dataset(opt, num_seqs=3, T=60, seed=0)
    assert ds.frame_size == 288
    feat, phase = ds.sample_batch(4)
    assert feat.shape == (4, opt.nframes_seq, 288)
    assert phase.shape == (4, opt.nframes_seq, 2)
    # velocities: feature row t root_velo == root_pos[t]-root_pos[t-1]
    raw = ds.feature_arr
    assert np.allclose(raw[2, 3:6], raw[2, 0:3] - raw[1, 0:3], atol=1e-5)
    # windows never straddle sequence boundaries
    for s in ds.rollouts:
        assert any(lo <= s and s + opt.nframes_seq <= hi
                   for lo, hi in ds.seq_bounds)


def test_trainer_learns_and_decodes(tmp_path):
    opt = tiny_opt(checkpoint_dir=str(tmp_path))
    ds = make_synthetic_pose_dataset(opt, num_seqs=2, T=60, seed=1)
    tr = MVAETrainer(opt, ds)
    first = tr.train_epoch(batches_per_epoch=2)
    for _ in range(5):
        last = tr.train_epoch(batches_per_epoch=2)
    assert all(np.isfinite(v) for v in first.values()), first
    assert last["recon"] < first["recon"]

    # batched decode for controller inference
    cond, _ = ds.sample_first_frame()
    z = jax.random.normal(jax.random.PRNGKey(0), (5, opt.latent_size))
    c = jnp.tile(jnp.asarray(cond.reshape(1, -1)), (5, 1))
    frame, phase = tr.decode(tr.params, z, c)
    assert frame.shape == (5, ds.frame_size) and phase.shape == (5, 2)
    assert np.all(np.isfinite(np.asarray(frame)))

    # checkpoint round trip
    tr.save_checkpoint("latest")
    p0 = jax.tree_util.tree_leaves(tr.params)[0].copy()
    tr.params = jax.tree_util.tree_map(lambda x: x * 0, tr.params)
    tr.load_checkpoint("latest")
    assert np.allclose(jax.tree_util.tree_leaves(tr.params)[0], p0)


def test_lr_decay_schedule():
    opt = tiny_opt()
    ds = make_synthetic_pose_dataset(opt, num_seqs=1, T=40, seed=2)
    tr = MVAETrainer(opt, ds)
    tr.epoch = 0
    assert tr.current_lr() == pytest.approx(opt.lr)
    tr.epoch = opt.n_epochs + opt.n_epochs_decay
    assert tr.current_lr() == pytest.approx(0.0)


def test_checkpoint_surgery_pads_grown_dims(tmp_path):
    old = {"dense": {"kernel": np.ones((4, 3), np.float32),
                     "bias": np.ones((3,), np.float32)}}
    path = os.path.join(tmp_path, "ck.npz")
    ckpt.save_pytree(path, old)
    new = {"dense": {"kernel": np.zeros((6, 5), np.float32),
                     "bias": np.zeros((5,), np.float32)},
           "extra": np.full((2,), 7.0, np.float32)}
    got = ckpt.load_pytree_with_surgery(path, new)
    assert np.allclose(got["dense"]["kernel"][:4, :3], 1.0)
    assert np.allclose(got["dense"]["kernel"][4:, :], 0.0)
    assert np.allclose(got["dense"]["kernel"][:, 3:], 0.0)
    assert np.allclose(got["dense"]["bias"], [1, 1, 1, 0, 0])
    assert np.allclose(got["extra"], 7.0)  # new param keeps fresh init


def test_random_walk_harness_reports_metrics(tmp_path):
    """MVAE rollout test harness (VERDICT r02 missing #6, reference
    `motion_vae/test.py:16-80`): random-walk metrics are finite and the
    bone-length scale matches the dataset's skeleton."""
    from vid2player3d_tpu.mvae.eval import report_for_trainer

    opt = tiny_opt(checkpoint_dir=str(tmp_path))
    ds = make_synthetic_pose_dataset(opt, num_seqs=3, T=60, seed=0)
    tr = MVAETrainer(opt, ds)
    for _ in range(3):
        tr.train_epoch(batches_per_epoch=2)
    rep = report_for_trainer(tr, num_steps=60, num_envs=4)
    for k in ("bone_len_mean", "bone_len_drift", "foot_skate",
              "phase_step_mean", "phase_smooth_frac", "root_speed"):
        assert k in rep and np.isfinite(rep[k]), (k, rep)
    assert rep["finite"]
    assert 0.05 < rep["bone_len_mean"] < 2.0, rep
