"""Probe: find fixture + LR settings where the 16-env imitation leg of
scripts/e2e_curriculum.py genuinely learns (VERDICT r04 next #2).

Round-4's leg anti-learned (0.63 -> 0.34, KL 4.3): the sinusoidal fixture
was easy enough that the PD-parity init was near-optimal, so every PPO
update was noise drift off the optimum. This probe raises motion difficulty
(real learning headroom) and compares LRs over a short run.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

from vid2player3d_tpu.utils.runtime import enable_compile_cache  # noqa: E402

enable_compile_cache()
jax.config.update("jax_default_device", jax.devices("cpu")[0])
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402


def write_fixture(d, amp_lo, amp_hi, n_files=3, T=180, fps=60.0, seed=0):
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n_files):
        t = np.linspace(0, T / fps, T)[:, None]
        freq = rng.uniform(0.5, 2.0, (1, 156))
        amp = rng.uniform(amp_lo, amp_hi, (1, 156))
        poses = (amp * np.sin(2 * np.pi * freq * t + rng.uniform(
            0, 2 * np.pi, (1, 156)))).astype(np.float64)
        poses[:, :3] = 0.0
        trans = np.stack([0.3 * np.sin(t[:, 0]), 0.5 * t[:, 0],
                          np.zeros(T)], -1)
        np.savez(os.path.join(d, f"seq_{i}.npz"), poses=poses, trans=trans,
                 betas=rng.uniform(-0.5, 0.5, 16), gender="neutral",
                 mocap_framerate=np.float64(fps))


def main():
    from vid2player3d_tpu.cli.run import main as cli
    from vid2player3d_tpu.core import smpl as S
    from vid2player3d_tpu.data.amass import convert_amass_dir

    out = "/tmp/probe_e2e"
    os.makedirs(out, exist_ok=True)
    for amp_lo, amp_hi, lr, tag in [(0.3, 0.8, "1e-4", "hard_1e-4"),
                                    (0.3, 0.8, "3e-5", "hard_3e-5"),
                                    (0.05, 0.25, "3e-5", "easy_3e-5")]:
        d = os.path.join(out, f"fix_{tag}")
        write_fixture(d, amp_lo, amp_hi)
        lib = convert_amass_dir(d, smpl_model=S.make_synthetic_smpl(),
                                target_fps=30.0)
        lib_path = os.path.join(out, f"lib_{tag}.npz")
        lib.save(lib_path)
        run = os.path.join(out, f"run_{tag}")
        mf = os.path.join(run, "metrics.jsonl")
        if os.path.exists(mf):
            os.remove(mf)
        rc = cli(["--cfg", "federer_im", "--motion_file", lib_path,
                  "--num_envs", "16", "--horizon", "8",
                  "--minibatch_size", "32", "--lr", lr,
                  "--lr_schedule", "constant", "--epochs", "80",
                  "--seed", "1", "--out", run])
        assert rc == 0
        rows = [json.loads(l) for l in open(mf)]
        r = [x["reward_mean"] for x in rows]
        kl = [x.get("kl", float("nan")) for x in rows]
        print(f"[{tag}] r0={r[0]:.3f} r10={np.mean(r[:10]):.3f} "
              f"r_last10={np.mean(r[-10:]):.3f} r_end={r[-1]:.3f} "
              f"kl0={kl[0]:.3f} kl_end={kl[-1]:.3f} "
              f"alive={rows[-1]['alive_ratio']:.3f}", flush=True)


if __name__ == "__main__":
    main()
