"""Seeded golden-rollout regression (SURVEY §4 test plan; north star
'bit-exact seeded env rollouts').

Two layers:
1. determinism — the same seeded rollout from two fresh env instances must
   agree BIT-EXACTLY (==, not allclose);
2. golden file — the rollout must match `tests/golden/humanoid_rollout.npz`
   byte-for-byte. When the physics/env semantics change intentionally,
   regenerate with:
       python -m pytest tests/test_golden_rollout.py --regen-golden
   (or delete the file and re-run; it is rewritten on absence) and commit
   the new golden together with the change that explains it.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vid2player3d_tpu.data.synthetic import make_synthetic_motion_lib
from vid2player3d_tpu.envs import HumanoidImConfig, HumanoidImEnv

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "humanoid_rollout.npz")


def _rollout(nsteps=6):
    lib = make_synthetic_motion_lib(num_motions=2, T=60, fps=30.0, seed=0)
    env = HumanoidImEnv(HumanoidImConfig(num_envs=4, substeps=2), lib, rng=0)
    state, obs, ctx = env.reset_all(jax.random.PRNGKey(42))
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(7)
    frames = []
    for t in range(nsteps):
        key, k = jax.random.split(key)
        act = 0.1 * jax.random.normal(k, (4, env.num_actions))
        state, out = step(state, act)
        frames.append(np.asarray(out.obs))
    return np.stack(frames), np.asarray(state.sim.root_pos), \
        np.asarray(state.sim.joint_quat)


@pytest.mark.slow
def test_rollout_bit_exact_deterministic():
    obs1, root1, jq1 = _rollout()
    obs2, root2, jq2 = _rollout()
    assert np.array_equal(obs1, obs2)
    assert np.array_equal(root1, root2)
    assert np.array_equal(jq1, jq2)


def test_rollout_matches_golden(request):
    obs, root, jq = _rollout()
    regen = request.config.getoption("--regen-golden", default=False)
    if regen or not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez_compressed(GOLDEN, obs=obs, root=root, jq=jq)
        if not regen:
            pytest.skip("golden file created; re-run to verify")
    g = np.load(GOLDEN)
    # compiled-code drift across XLA versions shows up here first; exact on
    # the same toolchain, tight tolerance guards against silent re-orderings
    np.testing.assert_allclose(obs, g["obs"], atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(root, g["root"], atol=1e-6)
    np.testing.assert_allclose(jq, g["jq"], atol=1e-6)
