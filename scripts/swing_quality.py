"""Data-level go/no-go for the synthetic swing rig: would a perfectly timed
strike with the generated swings RETURN the ball into the opponent court?

For each annotated contact of freshly generated rally sequences, this takes
the kinematic racket head velocity + face normal at the hit frame, applies
the environment's exact racket-contact math (restitution reflection + spin
gain, `envs/tennis.py::_ball_physics`), and integrates the outgoing ball
with the real aero model (`tennis/ball.py::simulate_flight`) over sampled
incoming ball states. Reports net-clear and bounce-in rates — the quantity
that was 0.0 *even at contact* in round 4 (VERDICT r04, missing #3).

Usage: python scripts/swing_quality.py [--swing_speed 1.0] [--n 8]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_default_device", jax.devices("cpu")[0])

from vid2player3d_tpu.data.tennis_motion import (  # noqa: E402
    Skeleton, generate_rally_sequence, grip_arrays, R_WRIST)
from vid2player3d_tpu.tennis import ball as B  # noqa: E402

from vid2player3d_tpu.envs.tennis import TennisConfig  # noqa: E402

COURT_HALF_LEN = 11.885
COURT_HALF_W = 4.115
NET_H = 0.914
# the environment's actual stringbed contact constants — the probe is only
# meaningful if it applies envs/tennis.py::_ball_physics math verbatim
_CFG = TennisConfig()
RACKET_RESTITUTION = _CFG.racket_restitution
SPIN_GAIN = _CFG.spin_gain
SPIN_CAP = _CFG.spin_cap


def collect_contacts(n_seq: int, swing_speed: float, seed: int):
    skel = Skeleton.from_smpl()
    reach = grip_arrays("eastern")[2]
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_seq):
        seq = generate_rally_sequence(rng, skel, swing_speed=swing_speed)
        rot = seq["joint_rotmat"].astype(np.float64)
        root = seq["joint_pos"][:, 0].astype(np.float64)
        pw, Rw = skel.fk(rot, root)
        head = pw[:, R_WRIST] - Rw[:, R_WRIST, :, 0] * reach
        normal = Rw[:, R_WRIST, :, 1]                 # grip normal = +y col
        vel = np.zeros_like(head)
        vel[1:-1] = (head[2:] - head[:-2]) * 15.0
        for f, fg in seq["hits"]:
            if fg and 0 < f < len(vel) - 1:
                out.append((head[f], vel[f], normal[f]))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--swing_speed", type=float, default=1.0)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--seed", type=int, default=3)
    a = ap.parse_args()

    contacts = collect_contacts(a.n, a.swing_speed, a.seed)
    rng = np.random.default_rng(a.seed + 1)
    pos0, vel0, spin0 = [], [], []
    speeds, normals = [], []
    for cpos, rvel, nrm in contacts:
        # incoming ball at the contact point: post-bounce descending flight
        # toward the player (pool-like ranges)
        bvel = np.array([rng.uniform(-2.0, 2.0),
                         -rng.uniform(8.0, 14.0),
                         rng.uniform(-7.0, -1.0)])
        rel = bvel - rvel
        vn = float(rel @ nrm)
        if vn >= 0:          # face pointing away from the incoming ball
            refl = rel
        else:
            refl = rel - (1.0 + RACKET_RESTITUTION) * vn * nrm
        out_v = rvel + refl
        tang = refl - (refl @ nrm) * nrm
        out_spin = min(SPIN_GAIN * np.linalg.norm(tang), SPIN_CAP)
        pos0.append(cpos)
        vel0.append(out_v)
        spin0.append(out_spin)
        speeds.append(np.linalg.norm(rvel))
        normals.append(nrm)

    pos0 = jnp.asarray(np.stack(pos0), jnp.float32)
    vel0 = jnp.asarray(np.stack(vel0), jnp.float32)
    spin0 = jnp.asarray(np.asarray(spin0), jnp.float32)
    traj = B.simulate_flight(pos0, vel0, spin0, num_frames=120)
    bp = np.asarray(traj.bounce_pos)
    bounced = np.asarray(traj.has_bounce)
    net_clear = np.asarray(traj.pass_net)
    land_in = (bounced & (np.abs(bp[:, 0]) < COURT_HALF_W)
               & (bp[:, 1] > 0) & (bp[:, 1] < COURT_HALF_LEN))
    ret_in = net_clear & land_in
    v = np.asarray(vel0)
    print(f"contacts={len(speeds)}  head_speed mean={np.mean(speeds):.1f} "
          f"m/s  out_speed mean={np.linalg.norm(v, axis=1).mean():.1f} m/s "
          f"out_vz p50={np.median(v[:, 2]):.1f}")
    print(f"net_clear={net_clear.mean():.2f}  bounce_in={ret_in.mean():.2f} "
          f" (bounce_y p50={np.median(bp[net_clear][:, 1]) if net_clear.any() else float('nan'):.1f})")


if __name__ == "__main__":
    main()
