"""Context-corruption transforms: masking, noise+confidence, dropout."""

import numpy as np
import jax
import jax.numpy as jnp

from vid2player3d_tpu.envs.corrupt import TransformSpecs, corrupt_body_pos


def _pos(B=3, L=5):
    key = jax.random.PRNGKey(0)
    return jax.random.normal(key, (B, L, 24, 3))


def test_identity_when_inactive():
    pos = _pos()
    out, conf = corrupt_body_pos(jax.random.PRNGKey(1), pos, None)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(pos))
    assert float(conf.min()) == 1.0


def test_mask_named_joints():
    pos = _pos()
    specs = TransformSpecs(mask_joints=("L_Wrist", "R_Wrist", "Head"))
    out, conf = corrupt_body_pos(jax.random.PRNGKey(1), pos, specs)
    from vid2player3d_tpu.core.smpl import SMPL_BONE_ORDER_NAMES as NAMES
    for j in specs.mask_joints:
        i = NAMES.index(j)
        assert np.abs(np.asarray(out[..., i, :])).max() == 0.0
        assert np.asarray(conf[..., i]).max() == 0.0
    # untouched joints keep conf 1 and original positions
    i = NAMES.index("Pelvis")
    np.testing.assert_array_equal(np.asarray(out[..., i, :]),
                                  np.asarray(pos[..., i, :]))


def test_noisy_joints_confidence():
    pos = _pos()
    specs = TransformSpecs(noisy_joints_prob=1.0, noisy_joints_noise_std=0.05,
                           noisy_joints_conf_std=0.02,
                           noisy_joints_min_conf=0.1)
    out, conf = corrupt_body_pos(jax.random.PRNGKey(2), pos, specs)
    conf = np.asarray(conf)
    assert ((0.0 <= conf) & (conf <= 1.0)).all()
    # occluded joints zeroed
    occ = conf == 0.0
    assert occ.any()
    assert np.abs(np.asarray(out)[occ]).max() == 0.0
    # unoccluded joints are perturbed but close
    err = np.linalg.norm(np.asarray(out - pos), axis=-1)
    assert err[~occ].max() < 0.5


def test_random_dropout_never_drops_root():
    pos = _pos()
    specs = TransformSpecs(mask_random_joints_prob=0.9)
    out, conf = corrupt_body_pos(jax.random.PRNGKey(3), pos, specs)
    conf = np.asarray(conf)
    assert (conf[..., 0] == 1.0).all()
    assert (conf == 0.0).any()


def test_jit_safe():
    pos = _pos()
    specs = TransformSpecs(noisy_joints_prob=0.5, noisy_joints_noise_std=0.02,
                           mask_random_joints_prob=0.1)
    f = jax.jit(lambda k, p: corrupt_body_pos(k, p, specs))
    out, conf = f(jax.random.PRNGKey(4), pos)
    assert np.isfinite(np.asarray(out)).all()


def test_env_integration():
    from vid2player3d_tpu.data.synthetic import make_synthetic_motion_lib
    from vid2player3d_tpu.envs import HumanoidImConfig, HumanoidImEnv
    lib = make_synthetic_motion_lib(num_motions=2, T=30, fps=30.0, seed=0)
    specs = TransformSpecs(mask_joints=("L_Toe", "R_Toe"))
    env = HumanoidImEnv(HumanoidImConfig(num_envs=2, substeps=2,
                                         transform_specs=specs), lib, rng=0)
    state, obs, ctx = env.reset_all(jax.random.PRNGKey(0))
    assert ctx["conf"].shape[-1] == 24
    # context rb_pos is MUJOCO-ordered: L_Toe is index 4 there (index 10 in
    # SMPL order — the named mask must resolve against the mujoco list)
    from vid2player3d_tpu.core.smpl import MUJOCO_JOINT_NAMES

    lt = MUJOCO_JOINT_NAMES.index("L_Toe")
    rt = MUJOCO_JOINT_NAMES.index("R_Toe")
    assert np.asarray(ctx["conf"][..., lt]).max() == 0.0
    assert np.asarray(ctx["conf"][..., rt]).max() == 0.0
    # ground-truth channel (block 4) is NOT corrupted
    gt = np.asarray(ctx["feat"][..., 72 + 96 + 69:72 + 96 + 69 + 72])
    assert np.abs(gt.reshape(gt.shape[0], gt.shape[1], 24, 3)[..., lt, :]).max() > 0.0
