"""Headline benchmark: humanoid env-steps/s at 4096 envs, policy in the loop.

Phase 1 measures the fused rollout hot loop (policy forward + PD control +
physics substeps + motion-lib target lookup + reward/termination), the
reference's `performance/step_fps`. Phase 2 measures the FULL `train_epoch`
(rollout + GAE + 6 mini-epochs x 256 minibatch-512 gradient steps at the
reference amass_im hyperparameters) — the reference's `performance/total_fps`
with `T_play`/`T_update` (`im_agent.py:204-221`, `common_agent.py:104-109`).
Baseline target (BASELINE.json north star): 1M env-steps/s/chip on the
rollout. Prints ONE JSON line; total_fps/t_play/t_update ride as extra keys.

Runs on whatever accelerator JAX defaults to (the real TPU chip under the
driver; falls back to CPU if no TPU is reachable).
"""

import json
import os
import time

import jax
import jax.numpy as jnp

from vid2player3d_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

from vid2player3d_tpu.data.synthetic import make_synthetic_motion_lib
from vid2player3d_tpu.envs import HumanoidImConfig, HumanoidImEnv
from vid2player3d_tpu.learn import ImitationPPO, PPOConfig

NUM_ENVS = 4096
HORIZON = 32
SUBSTEPS = 2          # matches reference amass_im: 2 sim substeps per 30 Hz control step
BASELINE_STEPS_PER_S = 1.0e6


def main():
    lib = make_synthetic_motion_lib(num_motions=8, T=300, fps=30.0, seed=0)
    env = HumanoidImEnv(HumanoidImConfig(num_envs=NUM_ENVS, substeps=SUBSTEPS),
                        lib, rng=0)
    # reference amass_im hyperparameters (minibatch 512, 6 mini-epochs) so
    # phase 2 measures the honest training epoch
    agent = ImitationPPO(env, PPOConfig(horizon=HORIZON, minibatch_size=512,
                                        mini_epochs=6), seed=7)
    ts = agent.init_state()

    @jax.jit
    def rollout(params, obs_norm, env_state, raw_obs, ctx_feat, key):
        def step_fn(carry, t):
            env_state, raw_obs, key = carry
            key, k = jax.random.split(key)
            _, _, mu, _, _ = agent._forward(env, params, obs_norm, raw_obs,
                                            ctx_feat, t)
            action = mu + agent.sigma[None] * jax.random.normal(k, mu.shape)
            env_state2, out = env.step(env_state, action)
            return (env_state2, out.obs, key), out.reward.sum()

        (env_state, raw_obs, _), rews = jax.lax.scan(
            step_fn, (env_state, raw_obs, key), jnp.arange(HORIZON))
        return env_state, raw_obs, rews.sum()

    key = jax.random.PRNGKey(0)
    env_state, raw_obs, ctx = env.reset_all(key)
    ctx_feat = ctx["feat"]

    # warmup + compile
    env_state, raw_obs, r = rollout(ts.params, ts.obs_norm, env_state, raw_obs,
                                    ctx_feat, key)
    jax.block_until_ready(r)

    reps = 5
    t0 = time.perf_counter()
    for i in range(reps):
        env_state, raw_obs, r = rollout(ts.params, ts.obs_norm, env_state,
                                        raw_obs, ctx_feat,
                                        jax.random.PRNGKey(i + 1))
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0

    steps_per_s = NUM_ENVS * HORIZON * reps / dt
    t_play = dt / reps

    # secondary: rollout at the reference's full amass_im scale (8192 envs,
    # `amass_im.yaml:4`) — better VPU occupancy, ~+15% steps/s
    env8 = HumanoidImEnv(HumanoidImConfig(num_envs=8192, substeps=SUBSTEPS),
                         lib, rng=0)
    agent8 = ImitationPPO(env8, PPOConfig(horizon=HORIZON, minibatch_size=512,
                                          mini_epochs=6), seed=7)
    ts8 = agent8.init_state()

    @jax.jit
    def rollout8(params, obs_norm, env_state, raw_obs, ctx_feat, key):
        def step_fn(carry, t):
            env_state, raw_obs, key = carry
            key, k = jax.random.split(key)
            _, _, mu, _, _ = agent8._forward(env8, params, obs_norm, raw_obs,
                                             ctx_feat, t)
            action = mu + agent8.sigma[None] * jax.random.normal(k, mu.shape)
            env_state2, out = env8.step(env_state, action)
            return (env_state2, out.obs, key), out.reward.sum()

        (env_state, raw_obs, _), rews = jax.lax.scan(
            step_fn, (env_state, raw_obs, key), jnp.arange(HORIZON))
        return env_state, raw_obs, rews.sum()

    st8, obs8, ctx8 = env8.reset_all(jax.random.PRNGKey(0))
    st8, obs8, r8 = rollout8(ts8.params, ts8.obs_norm, st8, obs8,
                             ctx8["feat"], jax.random.PRNGKey(0))
    jax.block_until_ready(r8)
    t0 = time.perf_counter()
    for i in range(reps):
        st8, obs8, r8 = rollout8(ts8.params, ts8.obs_norm, st8, obs8,
                                 ctx8["feat"], jax.random.PRNGKey(i + 1))
    jax.block_until_ready(r8)
    steps8 = 8192 * HORIZON * reps / (time.perf_counter() - t0)

    # phase 2: full training epoch at reference hyperparameters
    # (amass_im.yaml: minibatch 512, 6 mini-epochs) — the honest end-to-end
    # training number, `performance/total_fps`
    ts, m = agent.train_epoch(ts)           # compile + warmup
    jax.block_until_ready(m)
    ereps = 5
    t0 = time.perf_counter()
    for _ in range(ereps):
        ts, m = agent.train_epoch(ts)
    jax.block_until_ready(m)
    t_epoch = (time.perf_counter() - t0) / ereps
    total_fps = NUM_ENVS * HORIZON / t_epoch

    # the TRAINING rollout phase (policy + value forwards, neglogp,
    # trajectory storage — heavier than the lean inference rollout above),
    # so t_update = t_epoch - t_play_train attributes phases honestly
    roll_fn = jax.jit(lambda ts_, arrs, k: agent._rollout(
        env.with_arrays(arrs), ts_, k))
    traj = roll_fn(ts, env.arrays(), jax.random.PRNGKey(0))
    jax.block_until_ready(traj["reward"])
    t0 = time.perf_counter()
    for i in range(ereps):
        traj = roll_fn(ts, env.arrays(), jax.random.PRNGKey(i))
    jax.block_until_ready(traj["reward"])
    t_play_train = (time.perf_counter() - t0) / ereps

    print(json.dumps({
        "metric": "humanoid_env_steps_per_s",
        "value": round(steps_per_s, 1),
        "unit": "env-steps/s/chip",
        "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 4),
        "total_fps": round(total_fps, 1),
        "t_play_s": round(t_play_train, 4),
        "t_play_inference_s": round(t_play, 4),
        "t_update_s": round(max(t_epoch - t_play_train, 0.0), 4),
        "epoch_s": round(t_epoch, 4),
        "steps_per_s_8192envs": round(steps8, 1),
    }))


if __name__ == "__main__":
    main()
