"""Synthetic tennis-motion generator: the swing-primitive data the MVAE needs
(reference trains on video-reconstructed player motion with hit annotations,
`vid2player/motion_vae/dataset.py:80-92`; this is our manufactured stand-in)."""

import numpy as np
import pytest

from vid2player3d_tpu.data import tennis_motion as TM
from vid2player3d_tpu.mvae import MVAEOption
from vid2player3d_tpu.mvae.dataset import (assemble_features,
                                           load_video_dataset,
                                           phase_from_hits)
from vid2player3d_tpu.tennis import player as P
from vid2player3d_tpu.tennis.racket import grip_arrays


@pytest.fixture(scope="module")
def skel():
    return TM.Skeleton.from_smpl()


@pytest.fixture(scope="module")
def seq(skel):
    return TM.generate_rally_sequence(np.random.default_rng(3), skel,
                                      n_cycles=4)


def test_generator_validity(seq):
    jp, rot, hits = seq["joint_pos"], seq["joint_rotmat"], seq["hits"]
    T = jp.shape[0]
    assert jp.shape == (T, 24, 3) and rot.shape == (T, 24, 3, 3)
    assert np.isfinite(jp).all() and np.isfinite(rot).all()
    frames = [f for f, _ in hits]
    assert frames == sorted(frames) and frames[0] >= 1 and frames[-1] < T
    # rotations are proper
    det = np.linalg.det(rot.reshape(-1, 3, 3))
    np.testing.assert_allclose(det, 1.0, atol=1e-4)
    # alternating opponent/self hits
    fgs = [fg for _, fg in hits]
    assert fgs[0] is False and any(fgs)


def test_racket_contact_kinematics(seq, skel):
    """At every annotated self-hit the racket face points at the net and the
    head is moving at swing speed (the contract that makes phase-pi frames
    usable swing primitives)."""
    d_c, n_c, reach, _ = grip_arrays("eastern")
    rot, jp = seq["joint_rotmat"].astype(np.float64), seq["joint_pos"]
    pw, Rw = skel.fk(rot, jp[:, 0].astype(np.float64))
    racket = pw[:, TM.R_WRIST] + np.einsum(
        "tab,b->ta", Rw[:, TM.R_WRIST], d_c) * reach
    normal = np.einsum("tab,b->ta", Rw[:, TM.R_WRIST], n_c)
    speed = np.linalg.norm(np.diff(racket, axis=0), axis=-1) * 30.0
    for f, fg in seq["hits"]:
        if not fg:
            continue
        assert normal[f] @ np.array([0.0, 1.0, 0.0]) > 0.85, f
        # contact-speed swings (round-5): the forward swing is keyed in
        # seconds so the head strikes at broadcast stroke speed — fast
        # enough that the return clears the net (scripts/swing_quality.py)
        assert 6.0 < speed[f - 1] < 25.0, (f, speed[f - 1])
        assert 0.5 < racket[f, 2] < 1.9


def test_swing_classifier_agreement(skel):
    """The env's wrist-x swing classifier (`tennis/player.py:169-176`)
    must agree with the generator's intended swing type — otherwise the
    residual tables and contact-phase rewards act on the wrong swing."""
    rng = np.random.default_rng(11)
    captured = []
    orig = TM.sample_cycles

    def capture(r, n, **kw):
        cs = orig(r, n, **kw)
        captured.append(cs)
        return cs

    TM.sample_cycles = capture
    try:
        match = total = 0
        for _ in range(3):
            seq = TM.generate_rally_sequence(rng, skel, n_cycles=5)
            cycles = captured[-1]
            _, rad, _ = phase_from_hits(seq["joint_pos"].shape[0],
                                        seq["hits"])
            rel_wx = seq["joint_pos"][:, TM.R_WRIST, 0]
            opp = [f for f, fg in seq["hits"] if not fg]
            mine = [f for f, fg in seq["hits"] if fg]
            for c, f0, f1 in zip(cycles, opp[:-1], mine):
                segment = np.arange(f0, f1 + 1)
                w = segment[(rad[segment] > 2.0) & (rad[segment] < 3.5)]
                if len(w) == 0:
                    continue
                cls = 1 if rel_wx[w[0]] > 0 else 2
                match += (cls == c.swing)
                total += 1
        assert total >= 10 and match / total >= 0.9, (match, total)
    finally:
        TM.sample_cycles = orig


def test_mirror_sequence(seq):
    m = TM.mirror_sequence(seq)
    assert m["joint_pos"].shape == seq["joint_pos"].shape
    np.testing.assert_allclose(m["joint_pos"][:, 0, 0],
                               -seq["joint_pos"][:, 0, 0], atol=1e-6)
    det = np.linalg.det(m["joint_rotmat"].reshape(-1, 3, 3).astype(np.float64))
    np.testing.assert_allclose(det, 1.0, atol=1e-4)
    # left wrist of the mirror matches the (x-flipped) right wrist
    np.testing.assert_allclose(
        m["joint_pos"][:, TM.L_WRIST, 1],
        seq["joint_pos"][:, TM.R_WRIST, 1], atol=1e-5)


def test_dataset_roundtrip_video_format(tmp_path):
    out = TM.generate_tennis_dataset(str(tmp_path / "ds"), num_sequences=2,
                                     cycles_per_seq=3, seed=1)
    opt = MVAEOption.load("federer")
    ds = load_video_dataset(opt, out)
    assert ds.frame_size == P.FRAME_SIZE
    assert len(ds.rollouts) > 100
    feat, phase = ds.sample_batch(8)
    assert np.isfinite(feat).all()
    assert feat.shape == (8, opt.nframes_seq, P.FRAME_SIZE)
    # phase channel is populated (sin^2+cos^2 = 1 on valid frames)
    assert np.allclose((phase ** 2).sum(-1), 1.0, atol=1e-4)


def test_feature_layout_matches_player_slices():
    """Regression for the canonical feature order: whatever order the cfg
    tuple lists, assembled features must match the player's unpack slices
    (`tennis/player.py:37-42`) — the reference assembles in a fixed if-chain
    (`dataset.py:190-211`)."""
    opt = MVAEOption.load("federer")   # tuple order differs from canonical
    T, J = 5, 24
    rng = np.random.default_rng(0)
    jp = rng.standard_normal((T, J, 3)).astype(np.float32)
    rot = np.broadcast_to(np.eye(3, dtype=np.float32), (T, J, 3, 3))
    f = assemble_features(opt, jp, rot)
    assert f.shape[1] == P.FRAME_SIZE
    np.testing.assert_allclose(f[:, P.ROOT_POS], jp[:, 0], atol=1e-6)
    np.testing.assert_allclose(f[1:, P.ROOT_VEL], jp[1:, 0] - jp[:-1, 0],
                               atol=1e-6)
    np.testing.assert_allclose(
        f[:, P.JOINT_POS].reshape(T, 23, 3), jp[:, 1:], atol=1e-6)
    # identity rotmats -> rot6d rows [1,0,0, 0,1,0]
    r6 = f[:, P.JOINT_ROT6D].reshape(T, 24, 6)
    assert np.abs(r6 - np.array([1, 0, 0, 0, 1, 0])).max() < 1e-6


def test_tennis_motion_lib_roundtrip():
    """Rallies → MotionLib (π_low fine-tune path, the reference's
    `djokovic_im` player-motion stage): sampling returns finite states whose
    root stays on the near court and whose FK pose matches the generator's
    world pose at the sampled time."""
    from vid2player3d_tpu.data import motion_lib as ML
    from vid2player3d_tpu.data.tennis_motion import tennis_motion_lib
    import jax
    import jax.numpy as jnp

    lib = tennis_motion_lib(num_sequences=2, cycles_per_seq=2, seed=3)
    assert lib.num_motions == 2
    ids = jnp.array([0, 1, 0, 1])
    t = jnp.array([0.5, 1.0, 2.0, 3.0])
    st = ML.get_motion_state(lib, ids, t)
    rp = np.asarray(st["root_pos"])
    assert np.isfinite(rp).all()
    assert (rp[:, 2] > 0.5).all() and (rp[:, 2] < 1.3).all()
    assert (rp[:, 1] < -9.0).all()          # near-court side
    assert np.isfinite(np.asarray(st["dof_pos"])).all()
