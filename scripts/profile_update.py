"""Update-phase profile: where the epoch's time and bytes go (VERDICT r03 #3).

Times, on the current default accelerator, at the shipped amass_im scale
(4096 envs x horizon 32, minibatch 512, 6 mini-epochs):
  - the full train_epoch and its play/update split,
  - an update-only microbenchmark (same batch, minibatch sweep),
  - fwd+bwd-only vs fwd+bwd+Adam per-step marginals (isolates optimizer
    traffic from network compute),
and prints a JSON report used to write PROFILE.md.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from vid2player3d_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

from vid2player3d_tpu.data.synthetic import make_synthetic_motion_lib
from vid2player3d_tpu.envs import HumanoidImConfig, HumanoidImEnv
from vid2player3d_tpu.learn import ImitationPPO, PPOConfig

N, H = 4096, 32


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    lib = make_synthetic_motion_lib(num_motions=8, T=300, fps=30.0, seed=0)
    env = HumanoidImEnv(HumanoidImConfig(num_envs=N, substeps=2), lib, rng=0)
    report = {"num_envs": N, "horizon": H,
              "backend": jax.default_backend()}

    # epoch at shipped hyperparams, and at bigger minibatches
    for mb in (512, 1024, 2048):
        agent = ImitationPPO(env, PPOConfig(horizon=H, minibatch_size=mb,
                                            mini_epochs=6), seed=7)
        ts = agent.init_state()

        def epoch(ts):
            ts2, m = agent.train_epoch(ts)
            return ts2, m

        # warm + measure with fresh state each reps (donation)
        ts, m = agent.train_epoch(ts)
        jax.block_until_ready(m)
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            ts, m = agent.train_epoch(ts)
        jax.block_until_ready(m)
        t_epoch = (time.perf_counter() - t0) / reps
        report[f"epoch_s_mb{mb}"] = round(t_epoch, 4)
        report[f"total_fps_mb{mb}"] = round(N * H / t_epoch, 1)

    # isolate: fwd+bwd per minibatch vs fwd+bwd+clip+Adam
    agent = ImitationPPO(env, PPOConfig(horizon=H, minibatch_size=512,
                                        mini_epochs=6), seed=7)
    ts = agent.init_state()
    import numpy as np
    rng = np.random.default_rng(0)
    mb = {
        "obs": jnp.asarray(rng.standard_normal((512, 734)), jnp.float32),
        "action": jnp.asarray(rng.standard_normal((512, 75)), jnp.float32),
        "old_mu": jnp.zeros((512, 75)), "old_neglogp": jnp.zeros((512,)),
        "adv": jnp.ones((512,)), "return_norm": jnp.zeros((512,)),
        "alive": jnp.ones((512,)), "ctx_dof": jnp.zeros((512, 69)),
    }

    @jax.jit
    def grad_only(params, k):
        (l, s), g = jax.value_and_grad(agent._loss, has_aux=True)(
            params, mb, ts.obs_norm, agent.sigma)
        return jax.tree_util.tree_map(lambda x: x.sum(), g)

    @jax.jit
    def grad_adam(params, opt_state, k):
        (l, s), g = jax.value_and_grad(agent._loss, has_aux=True)(
            params, mb, ts.obs_norm, agent.sigma)
        upd, opt_state = agent.tx.update(g, opt_state, params)
        import optax
        params = optax.apply_updates(
            params, jax.tree_util.tree_map(lambda u: -2e-5 * u, upd))
        return params, opt_state

    # scan K steps in one program to avoid dispatch bias
    K = 64

    @jax.jit
    def scan_grad_adam(params, opt_state):
        def body(c, _):
            p, o = c
            (l, s), g = jax.value_and_grad(agent._loss, has_aux=True)(
                p, mb, ts.obs_norm, agent.sigma)
            upd, o = agent.tx.update(g, o, p)
            import optax
            p = optax.apply_updates(
                p, jax.tree_util.tree_map(lambda u: -2e-5 * u, upd))
            return (p, o), l
        (p, o), ls = jax.lax.scan(body, (params, opt_state), None, length=K)
        return p, o, ls.sum()

    @jax.jit
    def scan_grad_only(params):
        def body(c, _):
            (l, s), g = jax.value_and_grad(agent._loss, has_aux=True)(
                c, mb, ts.obs_norm, agent.sigma)
            # consume grads so nothing is dead-code eliminated, keep params
            c = jax.tree_util.tree_map(lambda p, gg: p + 0.0 * gg, c, g)
            return c, l
        p, ls = jax.lax.scan(body, params, None, length=K)
        return p, ls.sum()

    t_ga = timeit(lambda: scan_grad_adam(ts.params, ts.opt_state)) / K
    t_g = timeit(lambda: scan_grad_only(ts.params)) / K
    report["per_step_fwd_bwd_adam_us"] = round(t_ga * 1e6, 1)
    report["per_step_fwd_bwd_only_us"] = round(t_g * 1e6, 1)
    report["per_step_optimizer_overhead_us"] = round((t_ga - t_g) * 1e6, 1)

    # roofline context
    params_m = 4.65
    report["model_params_m"] = params_m
    report["flops_per_minibatch_gf"] = round(512 * params_m * 2 * 3 / 1e3, 2)
    print(json.dumps(report))
    with open("PROFILE.json", "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
