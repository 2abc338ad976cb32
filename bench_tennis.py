"""Tennis-stack benchmark: fused hierarchical env-steps/s + reset-cost share.

Measures the full high-level step — masked env reset, MVAE decode, FK
targets, frozen pi_low forward, humanoid physics substeps, ball substeps
with racket/body contacts, bounce estimate, reward, task machine — the
pipeline the reference runs as five Python-dispatched stages per frame
(SURVEY.md §3.2). Also times `reset_all` standalone: `_masked_env_reset`
recomputes a full fresh reset every step and masks it (fixed-shape
where-reset), so this bounds the share of step time the reset path costs
(VERDICT r02 weak #6 asked for exactly this measurement).

Prints one JSON line. Runs on the default accelerator (TPU under the
driver; CPU fallback).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from vid2player3d_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

from vid2player3d_tpu.envs import TennisConfig, TennisEnv
from vid2player3d_tpu.learn import FrozenImitator
from vid2player3d_tpu.tennis import player as P
from vid2player3d_tpu.tennis.ball import TennisBallGenerator

NUM_ENVS = 4096
STEPS = 32


def main():
    spec = P.make_random_spec(jax.random.PRNGKey(0), hidden=256, experts=6)
    rng = np.random.default_rng(0)
    feats = (rng.standard_normal((64, P.FRAME_SIZE)) * 0.05).astype(np.float32)
    feats[:, 2] = 0.95
    # stage-2 fidelity: 6 substeps, two-way coupling, body contacts, pi_low;
    # production reset amortization (256 candidate resets per step)
    cfg = TennisConfig(num_envs=NUM_ENVS, substeps=6,
                       ball_reaction_force=True, ball_body_contact=True,
                       reset_candidates=256)
    pi_low, pi_params = FrozenImitator.zeros().as_pi_low()
    env = TennisEnv(cfg, spec, feats,
                    ball_generator=TennisBallGenerator(num_candidates=4096,
                                                       seed=0),
                    pi_low=pi_low, pi_low_params=pi_params)

    reset = jax.jit(env.reset_all)
    step = jax.jit(env.step)
    act = jnp.zeros((NUM_ENVS, env.num_actions))

    state, obs = reset(jax.random.PRNGKey(1))
    state, out = step(state, act)            # compile
    jax.block_until_ready(out.obs)

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, out = step(state, act)
    jax.block_until_ready(out.obs)
    t_step = (time.perf_counter() - t0) / STEPS

    t0 = time.perf_counter()
    for i in range(STEPS):
        s2, _ = reset(jax.random.PRNGKey(i))
    jax.block_until_ready(s2.ball_pos)
    t_reset = (time.perf_counter() - t0) / STEPS

    k = cfg.reset_candidates or NUM_ENVS
    print(json.dumps({
        "metric": "tennis_env_steps_per_s",
        "value": round(NUM_ENVS / t_step, 1),
        "unit": "env-steps/s/chip",
        "t_step_ms": round(t_step * 1e3, 3),
        # cost of one FULL N-env reset_all (what the in-step masked reset
        # paid before candidate amortization), and the ~K/N share the
        # candidate pool leaves in the step
        "t_full_reset_all_ms": round(t_reset * 1e3, 3),
        "in_step_reset_ms_est": round(t_reset * k / NUM_ENVS * 1e3, 3),
        "reset_candidates": cfg.reset_candidates,
        "num_envs": NUM_ENVS, "substeps": 6,
    }))


if __name__ == "__main__":
    main()
