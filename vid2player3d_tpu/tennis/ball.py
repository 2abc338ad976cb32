"""Tennis-ball flight: aerodynamics, bounce, trajectory pools, estimators.

TPU-native replacement for the reference's *offline Isaac Gym ball sims*
(`vid2player/utils/tennis_ball.py:113-356`) and its pre-simulated lookup
tables (`tennis_ball_out_estimator.py`, `tennis_ball_in_estimator.py`).

The reference spins up a 10k-env PhysX simulation to build trajectory pools
and 0.1-resolution (vel, spin, height)-indexed grids, then nearest-neighbor
gathers at runtime. Here flight is a closed-form-force integration — gravity,
quadratic drag, Magnus lift, restitution bounce — so a fixed-length
`lax.scan`, vmapped over balls, computes the *exact* trajectory on device in
microseconds. Pools are still supported (sampling variety is a feature), but
the estimators simulate directly instead of table-gathering: better accuracy,
zero offline artifacts, and the whole thing stays inside jit.

Physics constants from `tennis_ball.py:15-37`:
  m=0.057 kg, R=0.032 m, rho=1.21, CD=0.55,
  lift coefficient CL = 1 / (2 + |v / v_spin|), sign from top/backspin,
  ground restitution 0.9 (ball URDF shape property), friction 0.2.
Spin is carried as a signed scalar `vspin` in rev/s — positive topspin —
matching the reference's convention; the angular-velocity *vector* in 13-dim
root states is `2*pi*vspin * normalize(cross(vel, -z))`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import court


class BallParams(NamedTuple):
    mass: float = 0.057
    radius: float = 0.032
    rho: float = 1.21
    gravity: float = 9.81
    base_cd: float = 0.55
    restitution: float = 0.9   # ball-court COR (asset shape property)
    friction: float = 0.2
    spin_scale: float = 5.0    # reference simulate(spin_scale=5)

    @property
    def kf(self) -> float:
        return self.rho * np.pi * self.radius ** 2 / 2.0


DEFAULT_PARAMS = BallParams()


def spin_vector(vel, vspin):
    """Signed rev/s scalar -> world angular velocity (reference
    `tennis_ball.py:135-136`): axis = normalize(cross(vel, -z))."""
    down = jnp.array([0.0, 0.0, -1.0], vel.dtype)
    axis = jnp.cross(vel, jnp.broadcast_to(down, vel.shape))
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-8)
    return vspin[..., None] * 2 * jnp.pi * axis


def aero_force(vel, vspin, p: BallParams = DEFAULT_PARAMS):
    """Drag + Magnus force on the ball, reference `tennis_ball.py:158-181`.

    force_drag = -kf * CD * |v| * v
    force_lift = -kf * CL * |v|^2 * cross(vel_tan, vel_norm) with CL sign
    flipped for topspin; vel_tan = cross(vel_norm, -z)."""
    speed = jnp.linalg.norm(vel, axis=-1, keepdims=True)
    vel_norm = vel / (speed + 1e-8)
    down = jnp.array([0.0, 0.0, -1.0], vel.dtype)
    vel_tan = jnp.cross(vel_norm, jnp.broadcast_to(down, vel.shape))
    cl = 1.0 / (2.0 + jnp.abs(speed[..., 0] / (jnp.abs(vspin) *
                                               p.spin_scale + 1e-6)))
    cl = jnp.where(vspin > 0, -cl, cl)[..., None]
    force_drag = -p.kf * p.base_cd * speed * vel
    force_lift = -p.kf * cl * speed ** 2 * jnp.cross(vel_tan, vel_norm)
    return force_drag + force_lift


class FlightResult(NamedTuple):
    traj: jnp.ndarray          # (..., num_frames, 3) at 30 Hz
    bounce_pos: jnp.ndarray    # (..., 3) first ground contact (0 if none)
    bounce_time: jnp.ndarray   # (...,) seconds to first bounce
    bounce_frame: jnp.ndarray  # (...,) int32 30 Hz frame index
    has_bounce: jnp.ndarray    # (...,) bool
    pass_net: jnp.ndarray      # (...,) bool: cleared the net at y=0 crossing
    max_height_after_bounce: jnp.ndarray  # (...,)
    final_pos: jnp.ndarray     # (..., 3)
    final_vel: jnp.ndarray     # (..., 3)
    final_vspin: jnp.ndarray   # (...,)


@functools.partial(jax.jit, static_argnames=("num_frames", "substeps"))
def simulate_flight(pos0, vel0, vspin0, num_frames: int = 100,
                    substeps: int = 4, p: BallParams = DEFAULT_PARAMS
                    ) -> FlightResult:
    """Integrate ball flight for `num_frames` 30 Hz frames with `substeps`
    inner steps each. Batched over leading dims. Bounce = reflective impulse
    with COR + Coulomb friction on the tangential velocity; spin flips to
    topspin after the bounce (reference hack, `tennis_ball.py:192-197`)."""
    dt = (1.0 / 30.0) / substeps
    batch = pos0.shape[:-1]

    def inner(carry, _):
        pos, vel, vspin, st = carry
        f = aero_force(vel, vspin, p)
        acc = f / p.mass + jnp.array([0.0, 0.0, -p.gravity], pos.dtype)
        new_vel = vel + acc * dt
        new_pos = pos + new_vel * dt

        # net crossing: sign change of y this step
        crossed = (pos[..., 1] > 0) != (new_pos[..., 1] > 0)
        w = jnp.abs(pos[..., 1]) / (jnp.abs(pos[..., 1] - new_pos[..., 1])
                                    + 1e-8)
        z_at_net = pos[..., 2] + w * (new_pos[..., 2] - pos[..., 2])
        first_cross = crossed & ~st["crossed_net"]
        st = dict(st)
        st["pass_net"] = jnp.where(
            first_cross, (z_at_net > court.NET_HEIGHT) & ~st["has_bounce"],
            st["pass_net"])
        st["crossed_net"] = st["crossed_net"] | crossed

        # ground bounce at z <= R
        hit = new_pos[..., 2] <= p.radius
        vz = new_vel[..., 2]
        # normal impulse + Coulomb tangential impulse
        jn = (1.0 + p.restitution) * jnp.abs(vz)
        vt = new_vel[..., :2]
        vt_norm = jnp.linalg.norm(vt, axis=-1, keepdims=True)
        dvt = jnp.minimum(p.friction * jn[..., None], vt_norm)
        vt_bounced = vt - dvt * vt / (vt_norm + 1e-8)
        bounced_vel = jnp.concatenate(
            [vt_bounced, (-p.restitution * vz)[..., None]], axis=-1)
        new_vel = jnp.where(hit[..., None], bounced_vel, new_vel)
        new_pos = new_pos.at[..., 2].set(
            jnp.where(hit, jnp.maximum(new_pos[..., 2], p.radius),
                      new_pos[..., 2]))
        first_hit = hit & ~st["has_bounce"]
        st["bounce_pos"] = jnp.where(first_hit[..., None], new_pos,
                                     st["bounce_pos"])
        st["bounce_t"] = jnp.where(first_hit, st["t"] + dt, st["bounce_t"])
        st["has_bounce"] = st["has_bounce"] | hit
        vspin = jnp.where(first_hit, jnp.abs(vspin), vspin)
        st["max_h_after"] = jnp.where(
            st["has_bounce"],
            jnp.maximum(st["max_h_after"], new_pos[..., 2]),
            st["max_h_after"])
        st["t"] = st["t"] + dt
        return (new_pos, new_vel, vspin, st), None

    def frame(carry, _):
        carry, _ = jax.lax.scan(inner, carry, None, length=substeps)
        return carry, carry[0]

    st0 = {
        "has_bounce": jnp.zeros(batch, bool),
        "bounce_pos": jnp.zeros(batch + (3,), pos0.dtype),
        "bounce_t": jnp.zeros(batch, pos0.dtype),
        "crossed_net": jnp.zeros(batch, bool),
        "pass_net": jnp.zeros(batch, bool),
        "max_h_after": jnp.zeros(batch, pos0.dtype),
        "t": jnp.zeros(batch, pos0.dtype),
    }
    (pos, vel, vspin, st), traj = jax.lax.scan(
        frame, (pos0, vel0, vspin0, st0), None, length=num_frames)
    traj = jnp.moveaxis(traj, 0, -2)  # (..., num_frames, 3)
    bounce_frame = jnp.round(st["bounce_t"] * 30.0).astype(jnp.int32)
    return FlightResult(
        traj=traj, bounce_pos=st["bounce_pos"], bounce_time=st["bounce_t"],
        bounce_frame=jnp.where(st["has_bounce"], bounce_frame,
                               num_frames - 1),
        has_bounce=st["has_bounce"], pass_net=st["pass_net"],
        max_height_after_bounce=st["max_h_after"],
        final_pos=pos, final_vel=vel, final_vspin=vspin)


# ---------------------------------------------------------------------------
# trajectory pool generator (reference TennisBallGenerator*, :221-456)
# ---------------------------------------------------------------------------

class TennisBallGenerator:
    """Samples launch states from the opponent's side, simulates flight, and
    keeps only valid serves-in: pass the net, bounce inside the target box,
    rise above 1 m after the bounce (reference `tennis_ball.py:316-339`).
    The surviving pool lives on device; `sample` is a pure gather usable
    inside jitted reset paths."""

    def __init__(self, cfg: Optional[dict] = None, num_candidates: int = 4096,
                 seed: int = 0, p: BallParams = DEFAULT_PARAMS,
                 backend: str = "auto"):
        """backend: 'jax' integrates the candidate pool on device; 'native'
        uses the C++/OpenMP host kernel (the framework's equivalent of the
        reference's offline Isaac farm, `tennis_ball.py:221-356`); 'auto'
        prefers native when the toolchain is available. Both backends share
        the force model, so pools agree to float accumulation order."""
        cfg = cfg or {}
        self.p = p
        self.traj_length = int(cfg.get("ball_traj_length", 100))
        origin_min = jnp.asarray(cfg.get("origin_min", [-4.0, 12.0, 1.0]))
        origin_max = jnp.asarray(cfg.get("origin_max", [4.0, 13.0, 1.5]))
        bounce_min = jnp.asarray(cfg.get("bounce_min", [-3.0, -10.0, 0.0]))
        bounce_max = jnp.asarray(cfg.get("bounce_max", [3.0, -7.0, 0.0]))
        vel_range = cfg.get("vel_range", [28.0, 30.0])
        vspin_range = cfg.get("vspin_range", [5.0, 10.0])
        theta_range = cfg.get("theta_range", [5.0, 15.0])

        key = jax.random.PRNGKey(seed)
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        n = num_candidates
        origin = jax.random.uniform(k1, (n, 3)) * (origin_max - origin_min) \
            + origin_min
        bounce = jax.random.uniform(k2, (n, 3)) * (bounce_max - bounce_min) \
            + bounce_min
        d = bounce[:, :2] - origin[:, :2]
        d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
        speed = jax.random.uniform(k3, (n,), minval=vel_range[0],
                                   maxval=vel_range[1])
        theta = jnp.deg2rad(jax.random.uniform(k4, (n,),
                                               minval=theta_range[0],
                                               maxval=theta_range[1]))
        vspin = jax.random.uniform(k5, (n,), minval=vspin_range[0],
                                   maxval=vspin_range[1])
        vel = jnp.stack([speed * jnp.cos(theta) * d[:, 0],
                         speed * jnp.cos(theta) * d[:, 1],
                         speed * jnp.sin(theta)], axis=1)

        if backend == "auto":
            from ..native import native_available
            backend = "native" if native_available() else "jax"
        if backend == "native":
            from ..native import simulate_flight_native
            res = simulate_flight_native(np.asarray(origin), np.asarray(vel),
                                         np.asarray(vspin),
                                         num_frames=self.traj_length,
                                         params=p)
            res = jax.tree_util.tree_map(jnp.asarray, res)
        else:
            res = simulate_flight(origin, vel, vspin,
                                  num_frames=self.traj_length, p=p)
        self.backend = backend
        valid = (res.pass_net & res.has_bounce
                 & (res.bounce_pos[:, 0] > bounce_min[0])
                 & (res.bounce_pos[:, 0] < bounce_max[0])
                 & (res.bounce_pos[:, 1] > bounce_min[1])
                 & (res.bounce_pos[:, 1] < bounce_max[1])
                 & (res.max_height_after_bounce > 1.0))
        idx = jnp.nonzero(valid)[0]
        if idx.size == 0:
            raise ValueError("no valid ball trajectories generated")
        self.traj_pool = res.traj[idx]
        self.launch_pos = origin[idx]
        self.launch_vel = vel[idx]
        self.launch_vspin = vspin[idx]
        self.pool_size = int(idx.size)
        # x-position-sorted order for opponent-position-conditioned sampling
        # (reference `tennis_ball.py:446-456` sorts the offline pool by
        # start_pos x)
        self.x_order = jnp.argsort(self.launch_x())

    def launch_x(self):
        return self.launch_pos[:, 0]

    def sample(self, key, n: int):
        """Random pool gather: (traj (n,T,3), launch_pos, launch_vel,
        launch_vspin). Pure; safe inside jit."""
        idx = jax.random.randint(key, (n,), 0, self.pool_size)
        return (self.traj_pool[idx], self.launch_pos[idx],
                self.launch_vel[idx], self.launch_vspin[idx])

    def sample_near(self, key, x: jnp.ndarray):
        """Opponent-position-conditioned gather: pick among the pool entries
        whose launch x is closest to `x` (the reference sorts the offline
        pool by x and indexes a window around the opponent,
        `tennis_ball.py:446-456`). Pure; safe inside jit."""
        n = x.shape[0]
        xs = self.launch_pos[self.x_order, 0]
        pos = jnp.searchsorted(xs, x)
        win = max(1, self.pool_size // 8)
        jitter = jax.random.randint(key, (n,), -win // 2, win // 2 + 1)
        idx = self.x_order[jnp.clip(pos + jitter, 0, self.pool_size - 1)]
        return (self.traj_pool[idx], self.launch_pos[idx],
                self.launch_vel[idx], self.launch_vspin[idx])

    # -- offline pool IO (reference TennisBallGeneratorOffline, :422-456) -----

    def save_npz(self, path: str) -> None:
        np.savez_compressed(
            path, traj=np.asarray(self.traj_pool),
            launch_pos=np.asarray(self.launch_pos),
            launch_vel=np.asarray(self.launch_vel),
            launch_vspin=np.asarray(self.launch_vspin))

    @classmethod
    def from_npz(cls, path: str, p: BallParams = DEFAULT_PARAMS
                 ) -> "TennisBallGenerator":
        """Load a pre-generated pool (the `ball_traj_in_subs*.npy` analog)."""
        data = np.load(path)
        self = cls.__new__(cls)
        self.p = p
        self.traj_pool = jnp.asarray(data["traj"])
        self.launch_pos = jnp.asarray(data["launch_pos"])
        self.launch_vel = jnp.asarray(data["launch_vel"])
        self.launch_vspin = jnp.asarray(data["launch_vspin"])
        self.pool_size = int(self.traj_pool.shape[0])
        self.traj_length = int(self.traj_pool.shape[1])
        self.backend = "offline"
        self.x_order = jnp.argsort(self.launch_x())
        return self


# ---------------------------------------------------------------------------
# estimators (reference lookup tables -> direct on-device simulation)
# ---------------------------------------------------------------------------

def _state_to_launch(ball_states):
    """13-dim root state (pos3 quat4 lin3 ang3) -> (pos, vel, vspin)."""
    pos = ball_states[..., 0:3]
    vel = ball_states[..., 7:10]
    vspin = jnp.linalg.norm(ball_states[..., 10:13], axis=-1) / (2 * jnp.pi)
    # recover spin sign: topspin has angular velocity along cross(vel, -z)
    down = jnp.array([0.0, 0.0, -1.0], vel.dtype)
    axis = jnp.cross(vel, jnp.broadcast_to(down, vel.shape))
    sign = jnp.sign(jnp.sum(ball_states[..., 10:13] * axis, axis=-1) + 1e-12)
    return pos, vel, vspin * sign


@functools.partial(jax.jit, static_argnames=("num_frames", "substeps"))
def estimate_out(ball_states, num_frames: int = 120, substeps: int = 1,
                 p: BallParams = DEFAULT_PARAMS):
    """Outgoing-bounce estimate from post-racket-contact ball states (N,13).

    Reference (`tennis_ball_out_estimator.py:124-205`) gathers pre-simulated
    grids at 0.1 m/s resolution; here we simulate the flight directly.
    Default substeps=1 (30 Hz Euler): this runs INSIDE the fused env step
    every frame, and a coarse direct integration is still far finer than the
    reference's 0.1 m/s-quantized lookup grid. Returns (valid, bounce_pos
    (N,2), bounce_time (N,), max_height (N,)) with bounce zeroed when the
    ball doesn't clear the net — same validity gates."""
    pos, vel, vspin = _state_to_launch(ball_states)
    vel_xy = jnp.linalg.norm(vel[..., :2], axis=-1)
    x_net = pos[..., 0] + vel[..., 0] * jnp.abs(
        pos[..., 1] / (vel[..., 1] + 1e-8))
    valid = ((vel_xy > 10.0) & (vel[..., 2] > -5.0) & (vel[..., 2] < 10.0)
             & (pos[..., 2] < 3.0) & (x_net > -4.0) & (x_net < 4.0))
    res = simulate_flight(pos, vel, vspin, num_frames=num_frames,
                          substeps=substeps, p=p)
    ok = res.pass_net & res.has_bounce
    bounce_pos = jnp.where(ok[..., None], res.bounce_pos[..., :2], 0.0)
    bounce_time = jnp.where(ok, res.bounce_time, 0.0)
    max_height = jnp.max(res.traj[..., 2], axis=-1)
    return valid, bounce_pos, bounce_time, max_height


@functools.partial(jax.jit, static_argnames=("traj_length",))
def estimate_in(ball_states, traj_length: int = 100,
                p: BallParams = DEFAULT_PARAMS):
    """Dual-play hand-off (reference `tennis_ball_in_estimator.py:49-81`):
    mirror the opponent's outgoing ball state through the net into this
    court's frame and produce the full incoming 30 Hz trajectory.

    Returns (traj (N,T,3), ball_states_in, ball_states_out)."""
    pos, vel, vspin = _state_to_launch(ball_states)
    # incoming state: mirrored x,y; velocity mirrored in the court plane
    pos_in = pos * jnp.array([-1.0, -1.0, 1.0], pos.dtype)
    vel_in = vel * jnp.array([-1.0, -1.0, 1.0], vel.dtype)
    res = simulate_flight(pos_in, vel_in, vspin, num_frames=traj_length, p=p)

    def pack(pp, vv, sp):
        quat = jnp.zeros(pp.shape[:-1] + (4,), pp.dtype).at[..., 3].set(1.0)
        return jnp.concatenate(
            [pp, quat, vv, spin_vector(vv, sp)], axis=-1)

    ball_states_in = pack(pos_in, vel_in, vspin)
    ball_states_out = pack(pos, vel, vspin)
    return res.traj, ball_states_in, ball_states_out
