"""Weak-scaling efficiency benchmark over a virtual CPU device mesh.

North star (BASELINE.md): >=80% scaling efficiency at multi-device. Real
multi-chip hardware is unavailable in this environment, so this measures the
SPMD data-parallel path on a forced-host-platform CPU mesh: fixed per-device
env count, sweep device counts, report env-steps/s and efficiency vs the
1-device run. The partitioning (env axis sharded, params replicated,
psum-only collectives) is identical to what runs on a real TPU pod slice —
only the interconnect differs.

Usage: python bench_scaling.py [--devices 1,2,4,8] [--envs-per-device 256]
Writes MULTICHIP_scaling.json and prints one JSON line per sweep point.
"""

import argparse
import json
import os
import subprocess
import sys
import time


def run_point(n_dev: int, envs_per_dev: int, horizon: int) -> dict:
    """Measure one mesh size in a fresh subprocess (device count is fixed at
    backend init, so each point needs its own process)."""
    code = f"""
import os, time, json
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count={n_dev}"
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
cpus = jax.devices("cpu")
jax.config.update("jax_default_device", cpus[0])
import numpy as np
from jax.sharding import Mesh
from vid2player3d_tpu.data.synthetic import make_synthetic_motion_lib
from vid2player3d_tpu.envs import HumanoidImConfig, HumanoidImEnv
from vid2player3d_tpu.learn import ImitationPPO, PPOConfig

N = {n_dev} * {envs_per_dev}
mesh = Mesh(np.array(cpus[:{n_dev}]).reshape({n_dev}), ("data",))
lib = make_synthetic_motion_lib(num_motions=4, T=120, fps=30.0, seed=0)
env = HumanoidImEnv(HumanoidImConfig(num_envs=N, substeps=2), lib, rng=0)
env = env.shard(mesh)
agent = ImitationPPO(env, PPOConfig(horizon={horizon},
                                    minibatch_size=N * {horizon} // 4,
                                    mini_epochs=1), seed=7, mesh=mesh)
ts = agent.init_state()
ts, m = agent.train_epoch(ts)          # compile + warmup
jax.block_until_ready(m["a_loss"])
reps = 3
t0 = time.perf_counter()
for _ in range(reps):
    ts, m = agent.train_epoch(ts)
jax.block_until_ready(m["a_loss"])
dt = time.perf_counter() - t0
print(json.dumps(dict(n_devices={n_dev}, num_envs=N,
                      env_steps_per_s=N * {horizon} * reps / dt)))
"""
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=1200)
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    raise RuntimeError(f"point n={n_dev} failed:\n{out.stderr[-2000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--envs-per-device", type=int, default=256)
    ap.add_argument("--horizon", type=int, default=8)
    ap.add_argument("--out", default="MULTICHIP_scaling.json")
    args = ap.parse_args()

    points = []
    for n in [int(x) for x in args.devices.split(",")]:
        t0 = time.time()
        p = run_point(n, args.envs_per_device, args.horizon)
        p["wall_s"] = round(time.time() - t0, 1)
        points.append(p)
        print(json.dumps(p), flush=True)

    base = points[0]["env_steps_per_s"] / points[0]["n_devices"]
    for p in points:
        p["efficiency"] = round(
            p["env_steps_per_s"] / p["n_devices"] / base, 4)
    report = {"points": points,
              "weak_scaling_efficiency_max_devices": points[-1]["efficiency"]}
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"metric": "weak_scaling_efficiency",
                      "value": points[-1]["efficiency"],
                      "unit": f"x at {points[-1]['n_devices']} devices",
                      "vs_baseline": round(points[-1]["efficiency"] / 0.8,
                                           4)}))


if __name__ == "__main__":
    main()
