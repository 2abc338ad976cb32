"""Offline trajectory-pool generation CLI.

    python -m vid2player3d_tpu.tennis.pool --out pool.npz \
        --num_candidates 100000 [--seed S] [--traj_length T] [--backend native]

The reference generates its `ball_traj_in_subs{2,6}.npy` pools by launching a
10k-env Isaac Gym simulation offline (`tennis_ball.py:359-419`). Here the
same job runs on any host through the native C++/OpenMP kernel (or the JAX
integrator), then saves an npz consumed by
`TennisBallGenerator.from_npz` at env-construction time.
"""

from __future__ import annotations

import argparse
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--out", required=True)
    ap.add_argument("--num_candidates", type=int, default=100_000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--traj_length", type=int, default=100)
    ap.add_argument("--backend", default="auto",
                    choices=("auto", "native", "jax"))
    args = ap.parse_args(argv)

    # offline job: keep candidate sampling on the host CPU — paying the TPU
    # tunnel handshake for a data-prep script is pure overhead
    import jax
    if args.backend != "jax":
        try:
            jax.config.update("jax_default_device", jax.devices("cpu")[0])
        except RuntimeError:
            pass

    from .ball import TennisBallGenerator

    t0 = time.time()
    gen = TennisBallGenerator({"ball_traj_length": args.traj_length},
                              num_candidates=args.num_candidates,
                              seed=args.seed, backend=args.backend)
    gen.save_npz(args.out)
    print(f"pool: {gen.pool_size}/{args.num_candidates} valid trajectories "
          f"({gen.backend} backend, {time.time() - t0:.1f}s) -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
