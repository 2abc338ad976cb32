"""Hierarchical tennis environment — the flagship vid2player task, fused.

TPU-native re-design of the reference's three-object stack (SURVEY.md §3.2):
`PhysicsMVAEController` (high-level env, `physics_mvae_controller.py`) owning
an `MVAEPlayer` (kinematic decoder, `mvae_player.py`) and a nested rl_games
player around `HumanoidSMPLIMMVAE` (Isaac physics task,
`humanoid_smpl_im_mvae.py`). The reference dispatches five Python stages per
frame — π_high, MVAE decode, FK, π_low, PhysX — through a player-inside-env
indirection; here ALL of it is one jitted

    step(state, action) -> (state, StepOutput)

so XLA fuses decoder matmuls, FK, PD control, articulation substeps, ball
aerodynamics, contact events, rewards, and the reaction/recovery task machine
into a single device program. Resets (env done, reaction, recovery) are
masked in-step `where`-updates, never indexed host branches.

Frame conventions: court z-up, net at y=0, player on y<0 (movement box
court_min/max = [-5,-16]..[5,-10], stage YAMLs). Ball launches arrive from
y≈+12. Kinematic (MVAE) joint rotations are SMPL-order local rotmats; the
physics humanoid is the same 24-body articulation used by HumanoidImEnv
(MuJoCo joint order, SMPL body frames).

Mirrored semantics, by reference line:
- action split = 32 MVAE latents × vae_action_scale 1.5 + 3 residual dof
  (`physics_mvae_controller.py:148-156, 247-263`)
- random-walk latents during recovery (`:252-257`)
- actor obs 225 = root pos/vel + 24 rel body pos + 24 rot6d + racket normal
  (`:333-346`); task obs = 10×3 future ball traj rel racket + 2 target
  (`:348-360`)
- rewards reach / return / return_w_estimate (`:491-601`)
- reaction window = reset_reaction_nframes ± 5 frames (`:228-231`)
- recovery on contact or ball passing the player (`:421-423`)
- termination: out of court, miss, estimated bounce-out, NaN (`:408-419`)
- bounce estimate at contact via the out-estimator (`:297-313`)
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import quat as Q
from ..core import rot as R
from ..core import smpl as S
from ..physics import asset, engine
from ..physics.model import ArticulationModel, ArticulationState, ContactParams
from ..tennis import ball as B
from ..tennis import court, player as P
from ..tennis.racket import grip_arrays
from . import domain_rand


@dataclasses.dataclass(frozen=True)
class TennisConfig:
    num_envs: int = 64
    control_dt: float = 1.0 / 30.0
    substeps: int = 6
    max_episode_length: int = 300
    # action space (physics_mvae_controller.py:148-156)
    num_latents: int = 32
    add_residual_dof: bool = True
    add_residual_root: bool = False
    residual_root_scale: float = 0.02
    vae_action_scale: float = 1.5
    random_walk_in_recovery: bool = True
    # kinematic-pose fidelity fixes (humanoid_smpl_im_mvae.py)
    fix_head_orientation: bool = False   # look at the ball (`:605-634`)
    # two-hand backhand: pull the free hand onto the racket handle during
    # bh swing phases (the reference's `fix_two_hand_backhand_post`, set in
    # djokovic/nadal configs, runs `optimize_two_hand_backhand`
    # post-hoc at vis time, `mvae_controller_vis.py:181-190`; here a cheap
    # fixed-iteration variant also runs INSIDE the fused step so the physics
    # targets themselves are two-handed)
    two_hand_backhand: bool = False
    two_hand_iters: int = 8
    # initial ball: "pool" launches from the offline trajectory pool;
    # "serve_toss" synthesizes the serve toss from the free hand (`:526-560`)
    init_ball_type: str = "pool"
    # physics coupling: racket-ball contact reacts back on the wrist
    # (PhysX two-way coupling through racket shapes, `:367-442`)
    ball_reaction_force: bool = False
    # ball collides with the humanoid's body spheres (PhysX collides the
    # ball with every humanoid shape via the collision-filter setup,
    # `humanoid_smpl_im_mvae.py:388-417`; without this the ball tunnels
    # through the player). Inelastic deflection off the per-body geom
    # spheres; racket-side wrist/hand are excluded (the racket disc owns
    # that region).
    ball_body_contact: bool = False
    # task machine
    reset_reaction_nframes: int = 70
    # phase-synchronized launch (single-chip curriculum aid, round 5): hold
    # the recovery->reaction transition until the swing phase, extrapolated
    # over the pool's mean launch->strike-zone flight, lands on the contact
    # phase pi — so a policy that simply rides the motion prior meets the
    # ball in its fast swing window instead of having to *discover* timing
    # by latent exploration (the rate-limiting step of rounds 4-5: policies
    # plateaued striking at 2 m/s because random phase offsets make the
    # 0.15 s fast phase miss ball arrival ~24x more often than not). The
    # rig's phase convention (mvae/dataset.py:18-19): phase 0 = opponent
    # hit, pi = my contact, rate pi/n_in with n_in in 58..78 frames
    # (data/tennis_motion.py::sample_cycles). The gate launches when
    # |frames-to-contact-phase - flight_frames| <= tol; a forced launch at
    # +sync_max_wait frames bounds the hold so training never deadlocks.
    # Off by default: exact reference timing semantics
    # (physics_mvae_controller.py:216-231) are the shipped behavior.
    sync_launch: bool = False
    sync_phase_rate: float = float(np.pi) / 68.0   # rad/frame, rig prior
    sync_flight_frames: float = -1.0   # <0 = auto-measure from the pool
    sync_tol_frames: float = 6.0
    sync_max_wait: int = 90
    obs_ball_traj_length: int = 10
    use_random_ball_target: str = "continuous"   # "discrete" | "continuous"
    # incoming-ball bounce box half-width in x (m). 3.0 = the reference's
    # full serve spread (`tennis_ball.py` bounce box). Stage-1a narrows it
    # so incoming balls land near the player's start — swing timing and
    # strike mechanics are learned BEFORE court coverage (single-chip
    # curriculum aid, annealed back out by stage 1 proper; the reference's
    # A100-scale training absorbs the full spread by brute force)
    ball_bounce_x_half: float = 3.0
    # reward
    reward_type: str = "return_w_estimate"       # reach | return | return_w_estimate
    reward_weights: Tuple[Tuple[str, float], ...] = (("pos", 0.1),
                                                     ("ball_pos", 0.9))
    reward_scales: Tuple[Tuple[str, float], ...] = (
        ("pos", 5.0), ("phase", 10.0), ("bounce_pos", 1.0),
        ("bounce_time", 0.5))
    enable_early_termination: bool = True
    # player court box (stage YAMLs court_min/max)
    court_min: Tuple[float, float] = (-5.0, -16.0)
    court_max: Tuple[float, float] = (5.0, -10.0)
    target_bounce_min: Tuple[float, float, float] = (-3.0, 7.0, 0.0)
    target_bounce_max: Tuple[float, float, float] = (3.0, 11.0, 0.0)
    # racket-ball contact model (TPU equivalent of PhysX shape contact).
    # restitution ~0.8 = stringbed COR; spin_gain 2.5 rev/s per m/s
    # tangential relative speed with a 40 rev/s cap matches broadcast
    # topspin (~2400 rpm) — tuned with scripts/swing_quality.py so a
    # 10-13 m/s contact-speed swing returns the ball inside the court
    # (the round-4 values 0.9/0.15 left returns flat + long: bounce_in 0)
    racket_restitution: float = 0.8
    spin_gain: float = 2.5      # rev/s per m/s tangential relative speed
    spin_cap: float = 40.0      # rev/s
    # the reference's racket is two geoms WELDED to the wrist (no joint,
    # `smpl_mesh_humanoid_federer.xml:188-191`: 0.35 m handle cylinder
    # density 500 + 0.15 m head disc density 150 ≈ 0.59 kg at up to 0.5 m
    # lever). A fixed joint is dynamically identical to folding that
    # mass/inertia into the wrist body — so swings carry real racket
    # inertia without adding bodies to the articulation.
    simulated_racket_mass: bool = True
    ball_traj_pool_len: int = 100
    # domain randomization (`base_task.py:250-445`, lifted to the tennis task
    # like every reference task inherits it); model fields perturb per epoch,
    # "ball_*" fields perturb the BallParams constants, obs/action noise is
    # per step. None = off.
    rand_specs: Optional[Tuple["domain_rand.RandSpec", ...]] = None
    # humanoid self-collision pairs (PhysX filter-mask analogue,
    # `humanoid_smpl_im_mvae.py:388-417`)
    self_collision: bool = True
    # fixed-shape reset amortization: the masked in-step reset recomputes a
    # FULL fresh reset (MVAE init, FK snap, pool sampling) for all N envs
    # every step and masks it — measured at up to ~43% of the fused step.
    # With reset_candidates=K>0, only K candidate resets are computed and
    # scattered onto done envs (at 300-frame episodes ~N/300 envs finish per
    # step, so K=256 covers 4096 envs with huge margin; overflow envs reuse
    # a candidate — they are random draws anyway). Requires homogeneous
    # per-env bodies (all tennis configs use one player per env block).
    # 0 = exact full recompute (dual mode: lane-paired serves need it).
    reset_candidates: int = 0

    @property
    def num_actions(self) -> int:
        return self.num_latents + (3 if self.add_residual_dof else 0) \
            + (3 if self.add_residual_root else 0)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class TennisState:
    mvae: P.MVAEPlayerState
    sim: ArticulationState
    # ball
    ball_pos: jnp.ndarray        # (N,3)
    ball_vel: jnp.ndarray        # (N,3)
    ball_vspin: jnp.ndarray      # (N,)
    ball_traj: jnp.ndarray       # (N,T,3) future ball positions (rolls left)
    # racket
    racket_pos: jnp.ndarray      # (N,3)
    racket_vel: jnp.ndarray      # (N,3)
    racket_normal: jnp.ndarray   # (N,3)
    racket_impulse: jnp.ndarray  # (N,3) pending ball-contact reaction impulse
    # task machine
    tar_action: jnp.ndarray      # (N,) int32: 1 reaction, 0 recovery
    tar_time: jnp.ndarray        # (N,) int32
    tar_time_total: jnp.ndarray  # (N,) int32
    target_bounce: jnp.ndarray   # (N,3)
    has_contact: jnp.ndarray     # (N,) bool latched this cycle
    has_bounce: jnp.ndarray      # (N,) bool outgoing-ball bounce latch
    bounce_pos: jnp.ndarray      # (N,3)
    bounce_in: jnp.ndarray       # (N,) bool
    est_bounce_pos: jnp.ndarray  # (N,2)
    est_bounce_time: jnp.ndarray # (N,)
    est_bounce_in: jnp.ndarray   # (N,) bool
    est_max_height: jnp.ndarray  # (N,)
    # bookkeeping
    progress: jnp.ndarray        # (N,) int32
    reset_buf: jnp.ndarray       # (N,) int32
    terminate_buf: jnp.ndarray   # (N,) int32
    key: jnp.ndarray             # PRNG carried through steps

    def tree_flatten(self):
        return tuple(getattr(self, f.name) for f in
                     dataclasses.fields(self)), ()

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class StepOutput:
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    terminate: jnp.ndarray
    sub_rewards: jnp.ndarray
    # behavioral env stats surfaced to the learner's metrics (the reference
    # pushes task stats through env `extras`, physics_mvae_controller.py:438-439)
    extras: Dict[str, jnp.ndarray] = dataclasses.field(default_factory=dict)

    def tree_flatten(self):
        ex_keys = tuple(sorted(self.extras))
        return (self.obs, self.reward, self.done, self.terminate,
                self.sub_rewards) + tuple(self.extras[k] for k in ex_keys), \
            ex_keys

    @classmethod
    def tree_unflatten(cls, ex_keys, ch):
        return cls(*ch[:5], extras=dict(zip(ex_keys, ch[5:])))


class TennisEnv:
    """Host wrapper owning static pieces (spec, model, pools); all step/reset
    logic is pure and jittable."""

    def __init__(self, cfg: TennisConfig, spec,
                 init_conditions,
                 ball_generator: Optional[B.TennisBallGenerator] = None,
                 smpl_model: Optional[S.SMPLModel] = None,
                 betas: Optional[np.ndarray] = None,
                 pi_low: Optional[Callable] = None,
                 pi_low_params=None,
                 pi_low_b: Optional[Callable] = None,
                 pi_low_params_b=None,
                 two_hand_lanes: Optional[Tuple[bool, ...]] = None,
                 contact_params: ContactParams = ContactParams()):
        """`spec` / `init_conditions` may be a single player's or a tuple of
        per-lane players' (dual rallies run TWO distinct identities: two
        MVAEs `mvae_player.py:33-40`, two frozen low-level nets
        `im_player.py:54-90`, per-lane handedness/residual tables, per-lane
        two-hand flags `federer_djokovic.yaml:65`). Lane of env i =
        i % num_lanes."""
        self.cfg = cfg
        specs = tuple(spec) if isinstance(spec, (tuple, list)) else (spec,)
        self.spec = specs[0]
        self.smpl = smpl_model if smpl_model is not None else S.make_synthetic_smpl()
        if betas is None:
            betas = np.zeros((cfg.num_envs, 10), np.float32)
        self.model = asset.build_humanoid_model(
            self.smpl, betas, self_collision=cfg.self_collision)
        # gender+betas body channel for the low-level imitation obs (matches
        # `HumanoidImEnv.motion_bodies`, i.e. MotionLib `motion_bodies` 11-dim)
        self.motion_bodies = jnp.concatenate(
            [jnp.zeros((cfg.num_envs, 1), jnp.float32),
             jnp.asarray(betas, jnp.float32)], axis=-1)
        if isinstance(init_conditions, (tuple, list)):
            assert len(init_conditions) == len(specs)
            # lanes may bring different-sized init sets (e.g. one trained
            # MVAE checkpoint + one synthetic fallback): trim to the common
            # size so the per-lane slices stay rectangular
            k = min(np.asarray(c).shape[0] for c in init_conditions)
            self._init_per_lane = k
            init_conditions = np.concatenate(
                [np.asarray(c, np.float32)[:k] for c in init_conditions],
                axis=0)
        else:
            self._init_per_lane = np.asarray(init_conditions).shape[0]
        self.init_conditions = jnp.asarray(init_conditions, jnp.float32)
        self.gen = ball_generator or B.TennisBallGenerator(
            {"ball_traj_length": cfg.ball_traj_pool_len},
            num_candidates=2048)
        # phase-synchronized launch: mean frames from launch until the pool
        # trajectory first enters the strike corridor (y < -11.5, the rig's
        # contact band, data/tennis_motion.py::sample_cycles cy range) —
        # measured from THIS pool so the gate tracks whatever ball
        # distribution the config selected
        self._sync_flight = float(cfg.sync_flight_frames)
        if cfg.sync_launch and self._sync_flight < 0.0:
            pool_y = np.asarray(self.gen.traj_pool[..., 1])
            crossed = pool_y < -11.5
            has = crossed.any(axis=1)
            first = np.argmax(crossed, axis=1)
            self._sync_flight = float(first[has].mean()) if has.any() \
                else float(cfg.reset_reaction_nframes)
        self.pi_low = pi_low
        self.pi_low_params = pi_low_params
        self.pi_low_b = pi_low_b
        self.pi_low_params_b = pi_low_params_b
        self.contact_params = contact_params
        self.ball_params = B.BallParams()
        # domain randomization engine (`base_task.py:250-445`)
        self.randomizer = domain_rand.DomainRandomizer(cfg.rand_specs) \
            if cfg.rand_specs else None

        # per-env handedness plumbing: every handedness-dependent constant is
        # an (N,) / (N,3) array gathered from the env's LANE spec, so dual
        # rallies can pair a right- and a left-handed player (the reference
        # loads per-player MVAEs and grips, `mvae_player.py:33-40`,
        # `racket.py:10-45`). Single-player envs have one lane.
        assert cfg.num_envs % len(specs) == 0
        self._lane_specs: Tuple[P.MVAEPlayerSpec, ...] = specs
        self._lane_of_env = np.arange(cfg.num_envs) % len(specs)
        if two_hand_lanes is not None:
            assert len(two_hand_lanes) == len(specs)
            self._lane_two_hand = tuple(two_hand_lanes)
        self._bind_lane_arrays()
        if cfg.simulated_racket_mass:
            self.model = self._weld_racket_mass(self.model)
        self.obs_dim = (3 + 3 + 24 * 3 + 24 * 6 + 3
                        + 3 * cfg.obs_ball_traj_length + 2)
        self.num_actions = cfg.num_actions
        self._rw = dict(cfg.reward_weights)
        self._rs = dict(cfg.reward_scales)

    def _bind_lane_arrays(self):
        """Derive per-env handedness-dependent arrays from the lane specs:
        wrist/free-hand/racket-hand body ids, grip frames, two-hand flags."""
        names = S.MUJOCO_JOINT_NAMES
        n_w = {True: names.index("R_Wrist"), False: names.index("L_Wrist")}
        n_h = {True: names.index("R_Hand"), False: names.index("L_Hand")}
        lane = self._lane_of_env
        rh = np.array([s.righthand for s in self._lane_specs], bool)[lane]
        self.righthand = jnp.asarray(rh)
        self.wrist_id = jnp.asarray(
            np.where(rh, n_w[True], n_w[False]).astype(np.int32))
        self.hand_id = jnp.asarray(
            np.where(rh, n_h[True], n_h[False]).astype(np.int32))
        self.free_hand_id = jnp.asarray(
            np.where(rh, n_h[False], n_h[True]).astype(np.int32))
        grips = {True: grip_arrays("eastern"),
                 False: grip_arrays("lefthand_semi_western")}
        # reach/head radius are grip-independent scalars
        self.racket_reach = grips[True][2]
        self.racket_head_radius = grips[True][3]
        self.racket_dir_c = jnp.asarray(
            np.where(rh[:, None], grips[True][0], grips[False][0]))
        self.racket_normal_c = jnp.asarray(
            np.where(rh[:, None], grips[True][1], grips[False][1]))
        # two-hand backhand per lane (reference sets it per player,
        # `federer_djokovic.yaml:65`); single-player: the cfg flag
        th = getattr(self, "_lane_two_hand",
                     (self.cfg.two_hand_backhand,) * len(self._lane_specs))
        self.two_hand_mask = jnp.asarray(np.asarray(th, bool)[lane])
        self.any_two_hand = bool(np.any(th))

    # env rows of lane l are a STATIC stride (single: all rows lane 0; dual:
    # even/odd), so per-lane spec application is slice + interleave, never a
    # dynamic-shape mask
    def _lane_rows(self, l: int) -> slice:
        L = len(self._lane_specs)
        return slice(None) if L == 1 else slice(l, None, L)

    def _interleave_lanes(self, parts):
        """Inverse of the per-lane stride split: parts[l] holds lane l's
        rows; stack+reshape restores env order (lanes alternate)."""
        if len(parts) == 1:
            return parts[0]

        def merge(*xs):
            return jnp.stack(xs, axis=1).reshape((-1,) + xs[0].shape[1:])

        return jax.tree_util.tree_map(merge, *parts)

    def _mvae_step(self, mvae, latents, residual):
        parts = []
        for l, sp in enumerate(self._lane_specs):
            r = self._lane_rows(l)
            res_l = None if residual is None else residual[r]
            parts.append(P.step(
                sp, jax.tree_util.tree_map(lambda x: x[r], mvae),
                latents[r], res_l))
        return self._interleave_lanes(parts)

    def _mvae_reset(self, key, root_xy):
        parts = []
        for l, sp in enumerate(self._lane_specs):
            r = self._lane_rows(l)
            init = self._lane_init_conditions(l)
            n = root_xy[r].shape[0]
            idx = jax.random.randint(jax.random.fold_in(key, l), (n,), 0,
                                     init.shape[0])
            parts.append(P.reset(sp, init[idx], root_xy=root_xy[r]))
        return self._interleave_lanes(parts)

    def _lane_init_conditions(self, l: int):
        K = self._init_per_lane
        if self.init_conditions.shape[0] == K:
            return self.init_conditions          # shared single set
        return self.init_conditions[l * K:(l + 1) * K]

    def _apply_pi_low(self, low_obs):
        """Frozen low-level policy, per lane when a second net is bound
        (reference dual checkpoint loading into network1/2,
        `im_player.py:54-90`)."""
        if self.pi_low_b is None or len(self._lane_specs) == 1:
            return self.pi_low(self.pi_low_params, low_obs)
        a = self.pi_low(self.pi_low_params, low_obs[0::2])
        b = self.pi_low_b(self.pi_low_params_b, low_obs[1::2])
        return jnp.stack([a, b], axis=1).reshape(-1, a.shape[-1])

    def _weld_racket_mass(self, model: ArticulationModel) -> ArticulationModel:
        """Fold the racket's mass/inertia into each env's racket-hand wrist
        body — the exact rigid-body reduction of the reference's jointless
        racket geoms (`smpl_mesh_humanoid_federer.xml:188-191`): handle =
        0.35 m cylinder r=0.016 density 500 (0.141 kg), head = 0.0425 m-thick
        disc r=0.15 density 150 (0.450 kg), both along the grip direction.
        Per-env wrist/grip (dual rallies can mix handedness)."""
        import numpy as np_

        d = np_.asarray(self.racket_dir_c, np_.float64)     # (N,3) per env
        m_h, m_d = 0.141, 0.450
        c_h = d * 0.175                       # handle center of mass
        c_d = d * float(self.racket_reach)    # head center
        w = np_.asarray(self.wrist_id)        # (N,)
        N = model.body_mass.shape[0]
        rows = np_.arange(N)

        mass = np_.asarray(model.body_mass).copy()
        com = np_.asarray(model.body_com).copy()
        inertia = np_.asarray(model.body_inertia).copy()

        m0 = mass[rows, w]
        new_m = m0 + m_h + m_d
        new_com = (com[rows, w] * m0[:, None] + m_h * c_h + m_d * c_d) \
            / new_m[:, None]

        def about_new_com(I_own, m, c):
            """Parallel-axis shift of a part (own inertia about its center
            c) to the combined center of mass."""
            r = np_.broadcast_to(c, (N, 3)) - new_com
            r2 = (r ** 2).sum(-1)
            shift = (m * (r2[:, None, None] * np_.eye(3)
                          - np_.einsum("ni,nj->nij", r, r)))
            return I_own + shift

        # own inertias about each geom's center (isotropic approximations:
        # rod l=0.35, disc r=0.15)
        I_h = np_.eye(3) * (m_h * 0.35 ** 2 / 12.0)
        I_d = np_.eye(3) * (0.5 * m_d * 0.15 ** 2)
        I_new = (about_new_com(inertia[rows, w].astype(np_.float64),
                               m0[:, None, None], com[rows, w])
                 + about_new_com(I_h, m_h, c_h)
                 + about_new_com(I_d, m_d, c_d))
        inertia[rows, w] = I_new.astype(inertia.dtype)
        mass[rows, w] = new_m
        com[rows, w] = new_com
        return dataclasses.replace(
            model, body_mass=jnp.asarray(mass), body_com=jnp.asarray(com),
            body_inertia=jnp.asarray(inertia))

    @property
    def rest_joint_offsets(self):
        """(N, 24, 3) parent-relative rest offsets, mujoco order (tracks the
        model so `with_arrays` re-binding stays consistent)."""
        return self.model.joint_pos

    @property
    def rest_joints_smpl(self):
        """(N, 24, 3) global rest joint positions, SMPL order — the FK rest
        pose consumed by the two-hand-backhand optimization (derived from the
        model so `with_arrays` re-binding stays consistent)."""
        off = self.model.joint_pos
        g = [jnp.zeros_like(off[:, 0])]
        for j in range(1, 24):
            g.append(g[int(self.model.parents[j])] + off[:, j])
        return jnp.stack(g, axis=1)[:, S.MUJOCO_2_SMPL]

    # -- array plumbing for SPMD (same contract as HumanoidImEnv) ------------

    ARRAY_FIELDS = ("model", "motion_bodies", "init_conditions",
                    "ball_params")

    def arrays(self):
        return {f: getattr(self, f) for f in self.ARRAY_FIELDS}

    def with_arrays(self, arrs):
        import copy

        env = copy.copy(self)
        for f, v in arrs.items():
            setattr(env, f, v)
        return env

    def shard(self, mesh, axis: str = "data") -> "TennisEnv":
        """Per-env arrays laid out P(axis) over `mesh`; shared pools /
        MVAE spec / frozen-policy params replicated — makes any jitted
        step/epoch SPMD data-parallel over the env axis (SURVEY.md §2.7)."""
        import copy

        from vid2player3d_tpu import parallel

        env = copy.copy(self)
        env.model = parallel.shard_leading_axis(self.model, mesh, axis)
        env.motion_bodies = parallel.shard_leading_axis(self.motion_bodies,
                                                        mesh, axis)
        env.init_conditions = parallel.replicate(self.init_conditions, mesh)
        for f in ("righthand", "wrist_id", "hand_id", "free_hand_id",
                  "racket_dir_c", "racket_normal_c", "two_hand_mask"):
            setattr(env, f, parallel.shard_leading_axis(getattr(self, f),
                                                        mesh, axis))
        # specs are plain dataclasses (not pytrees): replicate array leaves
        env._lane_specs = tuple(dataclasses.replace(
            sp, params=parallel.replicate(sp.params, mesh),
            avg=parallel.replicate(sp.avg, mesh),
            std=parallel.replicate(sp.std, mesh)) for sp in self._lane_specs)
        env.spec = env._lane_specs[0]
        if self.pi_low_params is not None:
            env.pi_low_params = parallel.replicate(self.pi_low_params, mesh)
        if self.pi_low_params_b is not None:
            env.pi_low_params_b = parallel.replicate(self.pi_low_params_b,
                                                     mesh)
        return env

    # -- kinematic targets ---------------------------------------------------

    # SMPL chain pelvis→head for the look-at fix
    _HEAD, _NECK = 15, 12
    _HEAD_CHAIN = (0, 3, 6, 9, 12, 15)

    def _fix_head_orientation(self, mvae: P.MVAEPlayerState, ball_pos):
        """Rotate Neck+Head so the character looks at the ball
        (`humanoid_smpl_im_mvae.py:605-634`): the head's +z look direction is
        yawed toward the ball, the correction split evenly between neck and
        head; skipped when the ball is already missed."""
        rm = mvae.joint_rotmat                                 # (N,24,3,3)
        N = rm.shape[0]
        head_g = rm[:, self._HEAD_CHAIN[0]]
        for j in self._HEAD_CHAIN[1:]:
            head_g = head_g @ rm[:, j]
        lookat = head_g[..., :2, 2]                            # (R @ [0,0,1])_xy
        lookat = lookat / (jnp.linalg.norm(lookat, axis=-1, keepdims=True)
                           + 1e-8)
        # head world position from the kinematic FK
        _, body_pos, _ = self._kinematic_targets(mvae)
        head_id_mj = S.MUJOCO_JOINT_NAMES.index("Head")
        head_ball = ball_pos[:, :2] - body_pos[:, head_id_mj, :2]
        head_ball = head_ball / (jnp.linalg.norm(head_ball, axis=-1,
                                                 keepdims=True) + 1e-8)
        diff = jnp.arctan2(head_ball[:, 1], head_ball[:, 0]) \
            - jnp.arctan2(lookat[:, 1], lookat[:, 0])
        diff = jnp.arctan2(jnp.sin(diff), jnp.cos(diff))       # wrap to ±pi
        miss = (ball_pos[:, 1] < mvae.root_pos[:, 1] - 0.5) \
            | (jnp.abs(ball_pos[:, 0]) > 4.0)
        diff = jnp.where(miss, 0.0, diff)

        aa = R.rotmat_to_angle_axis(
            rm[:, (self._HEAD, self._NECK)].reshape(-1, 3, 3)).reshape(N, 2, 3)
        aa = aa.at[:, :, 1].add(diff[:, None] / 2.0)
        new_rm = R.angle_axis_to_rotmat(aa.reshape(-1, 3)).reshape(N, 2, 3, 3)
        joint_rotmat = rm.at[:, self._HEAD].set(new_rm[:, 0]) \
            .at[:, self._NECK].set(new_rm[:, 1])
        return dataclasses.replace(mvae, joint_rotmat=joint_rotmat)

    def _apply_two_hand(self, mvae: P.MVAEPlayerState) -> P.MVAEPlayerState:
        """Two-hand backhand: adjust the free arm so both hands grip the
        racket handle on bh swing frames. Mask matches the reference's
        post-hoc fix (`mvae_controller_vis.py:185` swing_type==2 and
        2 < phase < 5); the optimization is the batched jittable Adam loop
        (`humanoid_smpl_im_mvae.py:948-1031`), run at few iterations so it
        stays cheap inside the fused step."""
        from ..tennis import twohand

        mask = ((mvae.swing_type == 2)
                & (mvae.phase_pred > 2.0) & (mvae.phase_pred < 5.0)
                & self.two_hand_mask)
        rm = mvae.joint_rotmat
        hands = {bool(sp.righthand) for l, sp in enumerate(self._lane_specs)
                 if self._lane_two_hand_flag(l)}
        for rh in sorted(hands):
            lane_m = mask & (self.righthand == rh)
            rm = twohand.optimize_two_hand_backhand(
                rm, self.rest_joints_smpl, righthand=rh,
                iters=self.cfg.two_hand_iters, mask=lane_m)
        return dataclasses.replace(mvae, joint_rotmat=rm)

    def _lane_two_hand_flag(self, l: int) -> bool:
        th = getattr(self, "_lane_two_hand",
                     (self.cfg.two_hand_backhand,) * len(self._lane_specs))
        return bool(th[l])

    def _kinematic_targets(self, mvae: P.MVAEPlayerState, res_root=None):
        """MVAE SMPL-order local rotmats -> sim PD dof targets (69, mujoco
        order) + target body pos/rot for the low-level obs (reference
        `_smpl_to_sim`, humanoid_smpl_im_mvae.py:897-946). `res_root`:
        optional (N,3) residual target-root translation from the policy
        (`:603 target_root_pos += res_root_actions`)."""
        rot_mj = mvae.joint_rotmat[:, S.SMPL_2_MUJOCO]        # (N,24,3,3)
        dof_tar = R.rotmat_to_angle_axis(
            rot_mj[:, 1:].reshape(-1, 3, 3)).reshape(
                mvae.joint_rotmat.shape[0], 69)
        # FK for target body positions/orientations in world. One fused
        # Pallas kernel on TPU: as stock ops the 23-step parent chain lowers
        # to hundreds of tiny sequential VPU launches and alone cost ~30% of
        # the fused tennis step (ops/fk.py).
        from ..ops.fk import fk_chain

        root_pos = mvae.root_pos if res_root is None \
            else mvae.root_pos + res_root
        body_pos, body_rotmat = fk_chain(rot_mj, self.rest_joint_offsets,
                                         root_pos, self.model.parents)
        body_rot = Q.rotmat_to_quat(body_rotmat)
        return dof_tar, body_pos, body_rot

    # -- reset helpers ---------------------------------------------------------

    def _sample_ball(self, key, n):
        traj, lpos, lvel, lspin = self.gen.sample(key, n)
        return traj, lpos, lvel, lspin

    def _serve_toss(self, free_hand_pos):
        """Serve ball toss from the free hand (`create_ball_state_for_serve`,
        humanoid_smpl_im_mvae.py:526-560): launch 0.1 m above the free hand
        with the projectile velocity that reaches the reference toss apex
        target (−0.87, −12.10, 2.71) in 25/30 s."""
        t = 25.0 / 30.0
        g = self.ball_params.gravity
        pos = free_hand_pos + jnp.array([0.0, 0.0, 0.1])
        target = jnp.array([-0.87, -12.10, 2.71])
        d = target[None] - pos
        vel = jnp.concatenate(
            [d[:, :2] / t, ((d[:, 2] + 0.5 * g * t * t) / t)[:, None]],
            axis=-1)
        vspin = jnp.zeros(pos.shape[0])
        T = self.gen.traj_length
        res = B.simulate_flight(pos, vel, vspin, num_frames=T,
                                p=self.ball_params)
        return res.traj, pos, vel, vspin

    def _sample_target(self, key, n):
        cfg = self.cfg
        lo = jnp.asarray(cfg.target_bounce_min)
        hi = jnp.asarray(cfg.target_bounce_max)
        if cfg.use_random_ball_target == "discrete":
            # left/middle/right thirds (physics_mvae_controller.py:236-244)
            r = jax.random.uniform(key, (n,))
            x = jnp.where(r < 0.33, -3.0, jnp.where(r > 0.67, 3.0, 0.0))
            return jnp.stack([x, jnp.full((n,), 10.0), jnp.zeros(n)], -1)
        return jax.random.uniform(key, (n, 3)) * (hi - lo) + lo

    def _init_tar_action(self, N) -> jnp.ndarray:
        """Initial task-machine role per env; the dual env overrides this so
        odd lanes start in recovery awaiting the serve return."""
        return jnp.ones(N, jnp.int32)

    # -- dual-mode hooks (overridden by DualTennisEnv) -------------------------

    def _reaction_trigger(self, state: TennisState, tar_time,
                          contact_now) -> jnp.ndarray:
        """When does a recovery env flip back to reaction? Single-player: the
        timed window `tar_time == tar_time_total` (reference
        `physics_mvae_controller.py:216-231`). Dual: the opponent's hit.

        With `cfg.sync_launch` the timed window additionally holds until the
        launch is phase-synchronized: frames until the swing phase reaches
        the contact phase pi (at the rig's prior rate) must match the pool's
        measured launch->strike-zone flight within `sync_tol_frames`, so the
        ball arrives during the fast swing window. A forced launch at
        `tar_time_total + sync_max_wait` bounds the hold."""
        cfg = self.cfg
        if not cfg.sync_launch:
            return tar_time == state.tar_time_total
        two_pi = 2.0 * jnp.pi
        # frames until phase_pred next reaches the contact phase pi
        delta = jnp.mod(jnp.pi - state.mvae.phase_pred, two_pi)
        frames_to_contact = delta / cfg.sync_phase_rate
        gate = jnp.abs(frames_to_contact - self._sync_flight) \
            <= cfg.sync_tol_frames
        timed = tar_time >= state.tar_time_total
        forced = tar_time >= state.tar_time_total + cfg.sync_max_wait
        return (timed & gate) | forced

    def _reaction_ball(self, state: TennisState, key, ball_state13,
                       reaction_mask):
        """Incoming ball for envs entering reaction. Single-player: sampled
        from the offline trajectory pool (`:216-227`). Dual: the opponent's
        outgoing ball mirrored through the net
        (`humanoid_smpl_im_mvae_dual.py:52-81`).

        Returns (traj, launch_pos, launch_vel, launch_vspin, ok) — `ok`
        marks hand-offs that actually clear the net; pool samples are
        pre-filtered so the single-player path is always valid.

        Opponent-position-conditioned sampling (`tennis_ball.py:437-442` via
        the `start_pos` argument at `humanoid_smpl_im_mvae.py:505-506`): when
        the previous rally ball ended on the far side (y > 0), the new launch
        x tracks where it landed — the next incoming ball comes from where
        the imaginary opponent would be."""
        k_u, k_n = jax.random.split(key)
        traj, lpos, lvel, lspin = self._sample_ball(k_u, self.cfg.num_envs)
        n_traj, n_pos, n_vel, n_spin = self.gen.sample_near(
            k_n, state.ball_pos[:, 0])
        other_side = state.ball_pos[:, 1] > 0.0

        def sel(a, b):
            m = other_side.reshape((-1,) + (1,) * (a.ndim - 1))
            return jnp.where(m, a, b)

        return (sel(n_traj, traj), sel(n_pos, lpos), sel(n_vel, lvel),
                jnp.where(other_side, n_spin, lspin),
                jnp.ones(self.cfg.num_envs, bool))

    def _couple_done(self, terminate, done):
        """Rally coupling: dual mode terminates both paired envs when either
        ends (`physics_mvae_controller_dual.py:112-121`)."""
        return terminate, done

    def _post_reset(self, state: TennisState) -> TennisState:
        """Post-process freshly reset env state (dual parks the recovery
        lane's ball out of play until the serve hand-off)."""
        return state

    def reset_all(self, key) -> Tuple[TennisState, jnp.ndarray]:
        cfg = self.cfg
        N = cfg.num_envs
        k_init, k_xy, k_ball, k_tar, k_tt, k_carry = jax.random.split(key, 6)

        # init MVAE state from a random dataset condition frame of each
        # lane's player, root near the baseline center (mvae_player.py:229-236)
        root_xy = (jax.random.uniform(k_xy, (N, 2)) - 0.5) \
            * jnp.asarray([2.0, 1.5]) + jnp.asarray([0.0, -13.0])
        mvae = self._mvae_reset(k_init, root_xy)

        # physics humanoid snapped to the kinematic pose
        dof_tar, body_pos, body_rot = self._kinematic_targets(mvae)
        sim = engine.set_state_from_reference(
            self.model, body_pos[:, 0], body_rot[:, 0],
            jnp.zeros((N, 3)), jnp.zeros((N, 3)), dof_tar,
            jnp.zeros((N, 69)))

        if cfg.init_ball_type == "serve_toss":
            bp, _, _, _ = engine.fk_world(self.model, sim)
            traj, lpos, lvel, lspin = self._serve_toss(
                bp[jnp.arange(N), self.free_hand_id])
        else:
            traj, lpos, lvel, lspin = self._sample_ball(k_ball, N)
        tt = cfg.reset_reaction_nframes + jax.random.randint(
            k_tt, (N,), -5, 5)

        wrist_pos, wrist_rot = self._wrist_state(sim)
        racket_pos, racket_normal = self._racket(wrist_pos, wrist_rot)

        state = TennisState(
            mvae=mvae, sim=sim,
            ball_pos=lpos, ball_vel=lvel, ball_vspin=lspin, ball_traj=traj,
            racket_pos=racket_pos, racket_vel=jnp.zeros((N, 3)),
            racket_normal=racket_normal,
            racket_impulse=jnp.zeros((N, 3)),
            tar_action=self._init_tar_action(N),
            tar_time=jnp.zeros(N, jnp.int32),
            tar_time_total=tt.astype(jnp.int32),
            target_bounce=self._sample_target(k_tar, N),
            has_contact=jnp.zeros(N, bool),
            has_bounce=jnp.zeros(N, bool),
            bounce_pos=jnp.zeros((N, 3)),
            bounce_in=jnp.zeros(N, bool),
            est_bounce_pos=jnp.zeros((N, 2)),
            est_bounce_time=jnp.zeros(N),
            est_bounce_in=jnp.zeros(N, bool),
            est_max_height=jnp.zeros(N),
            progress=jnp.zeros(N, jnp.int32),
            reset_buf=jnp.zeros(N, jnp.int32),
            terminate_buf=jnp.zeros(N, jnp.int32),
            key=k_carry,
        )
        state = self._post_reset(state)
        return state, self._obs(state)

    def _masked_env_reset(self, state: TennisState, key) -> TennisState:
        """where-reset of envs whose reset_buf latched last step — the
        fixed-shape equivalent of `_reset_envs(env_ids)` (:173-202).

        With `cfg.reset_candidates=K`, only K fresh states are computed and
        gathered onto done envs (slot = running count of done envs, clipped)
        — same semantics, ~K/N of the reset cost."""
        N = self.cfg.num_envs
        done = state.reset_buf == 1
        K = self.cfg.reset_candidates
        if K <= 0 or K >= N:
            fresh, _ = self.reset_all(key)

            def pick(a, b):
                if a.ndim == 0 or a.shape[0] != N:
                    return b
                d = done.reshape((N,) + (1,) * (a.ndim - 1))
                return jnp.where(d, a, b)

            upd = {}
            for f in dataclasses.fields(TennisState):
                a, b = getattr(fresh, f.name), getattr(state, f.name)
                # the rng key is the one non-per-env field; it must be kept
                # by NAME (at num_envs=2 an old-style (2,)-shaped key would
                # pass the per-env shape test and scatter element-wise)
                upd[f.name] = b if f.name == "key" else \
                    jax.tree_util.tree_map(pick, a, b)
            return TennisState(**upd)

        env_k = self._sliced_env(K)
        fresh, _ = env_k.reset_all(key)
        slot = jnp.clip(jnp.cumsum(done) - 1, 0, K - 1)

        def pick_k(a, b):
            if a.ndim == 0 or a.shape[0] != K:
                return b
            d = done.reshape((N,) + (1,) * (a.ndim - 1))
            return jnp.where(d, a[slot], b)

        upd = {}
        for f in dataclasses.fields(TennisState):
            a, b = getattr(fresh, f.name), getattr(state, f.name)
            # the rng key is the one non-per-env field; keep the carried one
            upd[f.name] = b if f.name == "key" else \
                jax.tree_util.tree_map(pick_k, a, b)
        return TennisState(**upd)

    def _sliced_env(self, K: int) -> "TennisEnv":
        """View of this env with num_envs=K (per-env arrays row-sliced) for
        candidate-pool resets. Assumes homogeneous bodies across envs."""
        import copy

        env = copy.copy(self)
        env.cfg = dataclasses.replace(self.cfg, num_envs=K)
        env.model = jax.tree_util.tree_map(lambda a: a[:K], self.model)
        env.motion_bodies = self.motion_bodies[:K]
        env._lane_of_env = self._lane_of_env[:K]
        for f in ("righthand", "wrist_id", "hand_id", "free_hand_id",
                  "racket_dir_c", "racket_normal_c", "two_hand_mask"):
            setattr(env, f, getattr(self, f)[:K])
        return env

    # -- racket ---------------------------------------------------------------

    def _wrist_state(self, sim: ArticulationState):
        bp, bq, bl, ba = engine.fk_world(self.model, sim)
        rows = jnp.arange(bp.shape[0])
        return bp[rows, self.wrist_id], bq[rows, self.wrist_id]

    def _racket(self, wrist_pos, wrist_quat):
        """Racket head + normal from the grip selected for this player's
        handedness (reference `racket.py:10-45`; left-handers get the
        mirrored `lefthand_semi_western` frame)."""
        rm = Q.quat_to_rotmat(wrist_quat)
        rdir = jnp.einsum("nab,nb->na", rm, self.racket_dir_c)
        rnormal = jnp.einsum("nab,nb->na", rm, self.racket_normal_c)
        return wrist_pos + rdir * self.racket_reach, rnormal

    # -- ball substep integration with racket contact --------------------------

    def _ball_physics(self, state: TennisState, racket_new_pos,
                      racket_normal, body_centers=None, body_radii=None):
        """Integrate the ball over the control step with aero forces, ground
        bounce, a swept racket-disc contact (the TPU equivalent of the
        reference's PhysX racket shapes + force-sensor detection,
        `humanoid_smpl_im_mvae.py:711-808`), and optional inelastic
        deflection off the humanoid body spheres (`body_centers` (N,24,3) /
        `body_radii` (N,24) world geom spheres; the PhysX ball-vs-humanoid
        collision filters, `:388-417`)."""
        cfg = self.cfg
        p = self.ball_params
        dt = cfg.control_dt / cfg.substeps
        N = cfg.num_envs
        r_prev = state.racket_pos
        r_new = racket_new_pos
        racket_vel = (r_new - r_prev) / cfg.control_dt

        def sub(carry, i):
            pos, vel, vspin, contact, bounce, bpos, imp = carry
            f = B.aero_force(vel, vspin, p)
            acc = f / p.mass + jnp.array([0.0, 0.0, -p.gravity])
            vel = vel + acc * dt
            pos_new = pos + vel * dt

            # racket contact: swept sphere-sphere closest approach over the
            # substep (true CCD — at 10-15 m/s contact-speed swings the
            # relative motion per substep exceeds the detection sphere, so
            # an endpoint-distance check tunnels). Ball moves pos->pos_new,
            # racket head r_pos0->r_pos1; both linear within the substep, so
            # the minimum separation is a 1-D quadratic in t.
            alpha0 = i / cfg.substeps
            alpha = (i + 1.0) / cfg.substeps
            r_pos0 = r_prev + alpha0 * (r_new - r_prev)
            r_pos = r_prev + alpha * (r_new - r_prev)
            d0 = pos - r_pos0
            d1 = pos_new - r_pos
            dd = d1 - d0
            denom = jnp.sum(dd * dd, axis=-1)
            t_min = jnp.clip(-jnp.sum(d0 * dd, axis=-1)
                             / jnp.maximum(denom, 1e-12), 0.0, 1.0)
            d_close = d0 + t_min[:, None] * dd
            dist = jnp.linalg.norm(d_close, axis=-1)
            rel_vel = vel - racket_vel
            approaching = jnp.sum(rel_vel * d0, axis=-1) < 0
            hit = ((dist < self.racket_head_radius + p.radius + 0.02)
                   & approaching & ~contact & (state.tar_action == 1))
            # reflect relative velocity about the racket normal
            vn = jnp.sum(rel_vel * racket_normal, axis=-1, keepdims=True)
            refl = rel_vel - (1.0 + cfg.racket_restitution) * vn * racket_normal
            out_vel = racket_vel + refl
            tangential = refl - jnp.sum(refl * racket_normal, axis=-1,
                                        keepdims=True) * racket_normal
            out_spin = jnp.clip(cfg.spin_gain * jnp.linalg.norm(
                tangential, axis=-1), 0.0, cfg.spin_cap)
            # contact impulse on the ball; its negative reacts on the racket
            # next step (PhysX two-way coupling, humanoid_smpl_im_mvae.py:367-442)
            imp = imp + jnp.where(hit[:, None],
                                  p.mass * (out_vel - vel), 0.0)
            vel = jnp.where(hit[:, None], out_vel, vel)
            vspin = jnp.where(hit, out_spin, vspin)
            contact = contact | hit

            # ball-vs-body sphere deflection: inelastic bounce off the
            # deepest penetrated body sphere (skipped on racket-hit substeps
            # so the paddle model owns its region)
            if body_centers is not None:
                db = pos_new[:, None] - body_centers            # (N,24,3)
                dist_b = jnp.linalg.norm(db, axis=-1)           # (N,24)
                pen = (body_radii + p.radius) - dist_b
                jb = jnp.argmax(pen, axis=-1)
                pen_j = jnp.take_along_axis(pen, jb[:, None], 1)[:, 0]
                nrm = jnp.take_along_axis(
                    db, jb[:, None, None].repeat(3, -1), 1)[:, 0]
                nrm = nrm / (jnp.linalg.norm(nrm, axis=-1,
                                             keepdims=True) + 1e-8)
                vn_b = jnp.sum(vel * nrm, axis=-1)
                bhit = (pen_j > 0.0) & (vn_b < 0.0) & ~hit
                vel = jnp.where(bhit[:, None], vel - vn_b[:, None] * nrm,
                                vel)
                pos_new = jnp.where(bhit[:, None],
                                    pos_new + nrm * pen_j[:, None], pos_new)

            # ground bounce
            ground = pos_new[:, 2] <= p.radius
            gvz = vel[:, 2]
            bvel = vel.at[:, 2].set(-p.restitution * gvz)
            bvel = bvel.at[:, :2].multiply(0.8)
            vel = jnp.where(ground[:, None], bvel, vel)
            pos_new = pos_new.at[:, 2].set(
                jnp.maximum(pos_new[:, 2], p.radius))
            first_bounce = ground & ~bounce & contact  # outgoing-ball bounce
            bpos = jnp.where(first_bounce[:, None], pos_new, bpos)
            bounce = bounce | first_bounce
            vspin = jnp.where(ground, jnp.abs(vspin), vspin)
            return (pos_new, vel, vspin, contact, bounce, bpos, imp), hit

        (pos, vel, vspin, contact, bounce, bpos, impulse), hits = jax.lax.scan(
            sub, (state.ball_pos, state.ball_vel, state.ball_vspin,
                  state.has_contact, state.has_bounce, state.bounce_pos,
                  jnp.zeros((N, 3))),
            jnp.arange(cfg.substeps))
        contact_now = jnp.any(hits, axis=0) & ~state.has_contact
        bounce_now = bounce & ~state.has_bounce
        return pos, vel, vspin, contact, bounce, bpos, contact_now, \
            bounce_now, racket_vel, impulse

    # -- observations -----------------------------------------------------------

    def _obs(self, state: TennisState) -> jnp.ndarray:
        cfg = self.cfg
        N = cfg.num_envs
        bp, bq, bl, ba = engine.fk_world(self.model, state.sim)
        root_pos = bp[:, 0]
        root_vel = bl[:, 0]
        rel = bp[:, 1:] - root_pos[:, None]          # (N,23,3)
        rel = jnp.concatenate([rel.reshape(N, -1),
                               (state.racket_pos - root_pos)], axis=-1)
        rot6d = R.rotmat_to_rot6d(Q.quat_to_rotmat(
            bq.reshape(-1, 4))).reshape(N, 24 * 6)
        actor = jnp.concatenate([root_pos, root_vel, rel, rot6d,
                                 state.racket_normal], axis=-1)
        ball_win = state.ball_traj[:, :cfg.obs_ball_traj_length]
        task = (ball_win - state.racket_pos[:, None]).reshape(N, -1)
        target = state.target_bounce[:, :2] - root_pos[:, :2]
        obs = jnp.concatenate([actor, task, target], axis=-1)
        return jnp.nan_to_num(obs, nan=0.0, posinf=0.0, neginf=0.0)

    # -- rewards (reference :491-601) -------------------------------------------

    def _reward(self, state: TennisState, contact_latched,
                contact_now=None):
        rs, rw = self._rs, self._rw
        phase = state.mvae.phase_pred
        pos_err = jnp.sum((state.ball_pos - state.racket_pos) ** 2, axis=-1)

        # contact-quality shaping (weight "quality", default 0 = reference
        # semantics): outgoing ball velocity toward the opponent at the
        # contact step. The est-gated ball_pos reward is a CLIFF — a graze
        # that deflects the ball backward and a committed forward strike
        # both read 0 until a return lands in the court. Measured on the
        # round-5 stage-1 policy: racket speed at contact p50 2 m/s,
        # outgoing v_y p50 -13 m/s (balls bounce BACKWARD off a
        # near-static racket); this term gives the gradient from graze ->
        # forward strike that the reference's real-motion prior provides
        # for free.
        if contact_now is not None:
            quality = jnp.where(contact_now,
                                jnp.clip(state.ball_vel[:, 1] / 12.0,
                                         0.0, 1.0), 0.0)
        else:
            quality = jnp.zeros_like(pos_err)
        w_quality = rw.get("quality", 0.0)
        # swing-speed shaping (weight "swing_speed", default 0): racket
        # head speed while the ball is within reach during the reaction
        # window — denser than the contact-gated quality term (contacts
        # are ~1e-3/step); "swing fast when the ball arrives" is exactly
        # the timing the policy fails to discover by exploration (racket
        # speed at contact p50 2 m/s vs the rig's 10-14 m/s).
        rspeed = jnp.linalg.norm(state.racket_vel, axis=-1)
        swing_speed = jnp.where((pos_err < 2.25) & (state.tar_action == 1),
                                jnp.clip(rspeed / 8.0, 0.0, 1.0), 0.0)
        w_swing = rw.get("swing_speed", 0.0)

        def near_reward(contact_phase):
            phase_err = (phase - contact_phase) ** 2
            return jnp.exp(-rs.get("pos", 5.0) * pos_err) * \
                jnp.exp(-rs.get("phase", 10.0) * phase_err)

        if self.cfg.reward_type == "reach":
            # unknown swing -> contact phase 3.0 (reference :504-508)
            near = near_reward(jnp.where(state.mvae.swing_type == -1, 3.0,
                                         jnp.pi))
            pos_reward = jnp.where(state.tar_action == 1, near, 0.0)
            reward = rw.get("pos", 1.0) * pos_reward
            subs = jnp.stack([pos_reward], -1)
        elif self.cfg.reward_type == "return":
            # bh contact tends to be earlier (reference :535-539)
            near = near_reward(jnp.where(state.mvae.swing_type >= 2, 3.0,
                                         jnp.pi))
            pos_reward = jnp.where(contact_latched, 1.0, near)
            perr = jnp.where(
                state.has_bounce,
                jnp.sum((state.bounce_pos - state.target_bounce) ** 2, -1),
                jnp.sum((state.ball_pos - state.target_bounce) ** 2, -1))
            ball_pos_reward = jnp.where(
                contact_latched, jnp.clip((400.0 - perr) / 400.0, 0.0, 1.0),
                0.0)
            reward = rw.get("pos", 0.0) * pos_reward + \
                rw.get("ball_pos", 0.0) * ball_pos_reward + \
                w_quality * quality + w_swing * swing_speed
            subs = jnp.stack([pos_reward, ball_pos_reward, quality,
                              swing_speed], -1)
        else:  # return_w_estimate (reference :575-579 uses swing_type_cycle)
            near = near_reward(jnp.where(state.mvae.swing_type_cycle >= 2,
                                         3.0, jnp.pi))
            pos_reward = jnp.where(contact_latched, 1.0, near)
            perr = jnp.sum(
                (state.est_bounce_pos - state.target_bounce[:, :2]) ** 2, -1)
            ball_pos_reward = state.est_bounce_in * \
                jnp.exp(-rs.get("bounce_pos", 0.05) * perr) * \
                jnp.exp(-rs.get("bounce_time", 0.1) * state.est_bounce_time)
            reward = rw.get("pos", 0.0) * pos_reward + \
                rw.get("ball_pos", 0.0) * ball_pos_reward + \
                w_quality * quality + w_swing * swing_speed
            subs = jnp.stack([pos_reward, ball_pos_reward, quality,
                              swing_speed], -1)
        return reward, subs

    # -- step --------------------------------------------------------------------

    def step(self, state: TennisState, action: jnp.ndarray
             ) -> Tuple[TennisState, StepOutput]:
        cfg = self.cfg
        N = cfg.num_envs
        key, k_reset, k_rw, k_ball, k_tar, k_tt = jax.random.split(
            state.key, 6)

        # 1) masked full reset of done envs (start-of-step, like play_steps)
        state = self._masked_env_reset(state, k_reset)
        state = dataclasses.replace(state, key=key)

        # 2) action split + recovery random-walk latents (:247-263)
        latents = action[:, :cfg.num_latents] * cfg.vae_action_scale
        if cfg.random_walk_in_recovery:
            rnd = jnp.clip(jax.random.normal(k_rw, latents.shape), -5.0, 5.0)
            latents = jnp.where((state.tar_action == 0)[:, None], rnd,
                                latents)
        residual = action[:, cfg.num_latents:cfg.num_latents + 3] \
            if cfg.add_residual_dof else None
        n_res = cfg.num_latents + (3 if cfg.add_residual_dof else 0)
        res_root = action[:, n_res:n_res + 3] * cfg.residual_root_scale \
            if cfg.add_residual_root else None

        # 3) kinematic MVAE frame (+ optional head look-at-ball fix and
        # two-hand-backhand correction)
        mvae = self._mvae_step(state.mvae, latents, residual)
        if cfg.fix_head_orientation:
            mvae = self._fix_head_orientation(mvae, state.ball_pos)
        if self.any_two_hand:
            mvae = self._apply_two_hand(mvae)
        dof_tar, tar_body_pos, tar_body_rot = self._kinematic_targets(
            mvae, res_root)

        # 4) frozen low-level policy (or pure PD tracking). The policy's
        # dof output is a RESIDUAL around the kinematic target (the
        # residual-action head `mu += target_dof`,
        # `im_network_builder.py:226-229`); both paths clamp the PD target
        # around the current pose exactly like the imitation env
        # (`humanoid_smpl_im.py:391-396`), so a zero policy reproduces the
        # PD-only fallback bit-for-bit.
        cur_dof = engine.dof_pos(state.sim)
        lim = 0.5 * jnp.pi
        if self.pi_low is not None:
            low_obs = self._low_level_obs(state.sim, dof_tar, tar_body_pos,
                                          tar_body_rot)
            low_act = self._apply_pi_low(low_obs)
            pd_tar = dof_tar + low_act[:, :69]
            root_force = root_torque = None
            if low_act.shape[-1] >= 75:
                heading_q = Q.calc_heading_quat(
                    Q.remove_base_rot(state.sim.root_quat))
                root_force = Q.quat_rotate(heading_q,
                                           low_act[:, 69:72] * 31.85)
                root_torque = Q.quat_rotate(heading_q,
                                            low_act[:, 72:75] * 31.85)
        else:
            pd_tar, root_force, root_torque = dof_tar, None, None
        pd_tar = jnp.clip(pd_tar, cur_dof - lim, cur_dof + lim)

        # 5) humanoid physics substeps; the previous step's ball-contact
        # impulse reacts on the wrist (two-way coupling)
        extra_f = extra_t = None
        if cfg.ball_reaction_force:
            N_ = state.racket_impulse.shape[0]
            react = -state.racket_impulse / cfg.control_dt
            wrist_prev, _ = self._wrist_state(state.sim)
            arm = state.racket_pos - wrist_prev
            rows = jnp.arange(N_)
            extra_f = jnp.zeros((N_, 24, 3)).at[rows, self.wrist_id].set(react)
            extra_t = jnp.zeros((N_, 24, 3)).at[rows, self.wrist_id].set(
                jnp.cross(arm, react))
        sim = engine.control_step(
            self.model, state.sim, pd_tar, root_force, root_torque,
            substeps=cfg.substeps, control_dt=cfg.control_dt,
            contact_params=self.contact_params,
            extra_force_w=extra_f, extra_torque_w=extra_t)

        # 6) racket from the new wrist pose; ball substeps + contacts
        bp_new, bq_new, _, _ = engine.fk_world(self.model, sim)
        rows_w = jnp.arange(bp_new.shape[0])
        wrist_pos = bp_new[rows_w, self.wrist_id]
        wrist_quat = bq_new[rows_w, self.wrist_id]
        racket_pos, racket_normal = self._racket(wrist_pos, wrist_quat)
        body_centers = body_radii = None
        if cfg.ball_body_contact:
            # world geom spheres of the 24 bodies (first 24 contact-sphere
            # slots are the per-body geoms, `physics/asset.py:133-141`);
            # racket-side wrist+hand excluded — the racket disc owns them
            off = Q.quat_rotate(
                bq_new.reshape(-1, 4),
                self.model.contact_offset[:, :24].reshape(-1, 3)
            ).reshape(bp_new.shape)
            body_centers = bp_new + off
            body_radii = self.model.contact_radius[:, :24]
            rows = jnp.arange(body_radii.shape[0])
            body_radii = body_radii.at[rows, self.wrist_id].set(0.0) \
                                   .at[rows, self.hand_id].set(0.0)
        (ball_pos, ball_vel, ball_vspin, contact, bounce, bpos, contact_now,
         bounce_now, racket_vel, impulse) = self._ball_physics(
             state, racket_pos, racket_normal, body_centers, body_radii)

        # 7) bounce-in bookkeeping + estimate at contact (:284-313)
        bounce_in = state.bounce_in | (
            bounce_now
            & (bpos[:, 0] > court.COURT_MIN[0])
            & (bpos[:, 0] < court.COURT_MAX[0])
            & (bpos[:, 1] > court.COURT_MIN[1])
            & (bpos[:, 1] < court.COURT_MAX[1]))

        ball_state13 = jnp.concatenate([
            ball_pos, jnp.zeros((N, 4)).at[:, 3].set(1.0), ball_vel,
            B.spin_vector(ball_vel, ball_vspin)], axis=-1)

        # At training scale some env contacts nearly every step, so a
        # `lax.cond` on any(contact_now) would always take the expensive
        # branch while adding a cross-shard all-reduce under SPMD — compute
        # the estimate unconditionally and mask per env instead.
        valid, ebp, ebt, emh = B.estimate_out(ball_state13, num_frames=90,
                                              p=self.ball_params)
        upd = contact_now & valid
        est_bounce_pos = jnp.where(upd[:, None], ebp, state.est_bounce_pos)
        est_bounce_time = jnp.where(upd, ebt, state.est_bounce_time)
        est_max_height = jnp.where(upd, emh, state.est_max_height)
        est_bounce_in = jnp.where(
            upd,
            (ebp[:, 0] > court.COURT_MIN[0]) & (ebp[:, 0] < court.COURT_MAX[0])
            & (ebp[:, 1] > court.COURT_MIN[1])
            & (ebp[:, 1] < court.COURT_MAX[1]),
            state.est_bounce_in)

        # 8) roll the future-ball window (physics_step, :366-370)
        ball_traj = jnp.roll(state.ball_traj, -1, axis=1).at[:, -1].set(0.0)

        tar_time = state.tar_time + 1
        progress = state.progress + 1

        new_state = dataclasses.replace(
            state, mvae=mvae, sim=sim, ball_pos=ball_pos, ball_vel=ball_vel,
            ball_vspin=ball_vspin, ball_traj=ball_traj,
            racket_pos=racket_pos, racket_vel=racket_vel,
            racket_normal=racket_normal, racket_impulse=impulse,
            has_contact=contact,
            has_bounce=bounce, bounce_pos=bpos, bounce_in=bounce_in,
            est_bounce_pos=est_bounce_pos, est_bounce_time=est_bounce_time,
            est_bounce_in=est_bounce_in, est_max_height=est_max_height,
            tar_time=tar_time, progress=progress)

        # 9) reward BEFORE task-machine transitions (post_physics_step order)
        reward, subs = self._reward(new_state, contact, contact_now)
        obs = self._obs(new_state)

        # 10) reset / task machine (:408-436)
        root_pos = new_state.sim.root_pos
        cmin, cmax = jnp.asarray(cfg.court_min), jnp.asarray(cfg.court_max)
        out_of_court = ((root_pos[:, 0] < cmin[0]) | (root_pos[:, 1] < cmin[1])
                        | (root_pos[:, 0] > cmax[0])
                        | (root_pos[:, 1] > cmax[1]))
        # magnitude-latched like the imitation env: a blown-up sim can be
        # finite at 1e30 yet overflow every squared term downstream; zero
        # the whole row so the learner's batch stays bounded (the env
        # terminates and re-resets next step)
        has_nan = ~jnp.all(jnp.isfinite(obs) & (jnp.abs(obs) < 1e6), axis=-1)
        obs = jnp.where(has_nan[:, None], 0.0, obs)
        # ball-state divergence guard (VERDICT r04 weak #3): a missed ball
        # integrates ballistically without bound — km-scale excursions are
        # finite, below the 1e6 obs latch, and poison distance metrics and
        # value targets. Terminate once the ball leaves any plausible play
        # volume (the reference's PhysX arena implicitly bounds this).
        ball_gone = ((jnp.abs(ball_pos[:, 0]) > 20.0)
                     | (jnp.abs(ball_pos[:, 1]) > 25.0)
                     | (ball_pos[:, 2] > 20.0))
        terminate = out_of_court | has_nan | ball_gone

        in_reaction = new_state.tar_action == 1   # pre-transition role
        ball_passed = (ball_pos[:, 1] < root_pos[:, 1] - 1.0) & in_reaction
        reset_recovery = in_reaction & (contact | ball_passed)
        reset_reaction = self._reaction_trigger(new_state, tar_time,
                                                contact_now)

        # incoming ball for reaction transitions; `handoff_ok` gates netted
        # dual hand-offs so those rallies terminate instead of tunneling
        traj_new, lpos, lvel, lspin, handoff_ok = self._reaction_ball(
            new_state, k_ball, ball_state13, reset_reaction)

        if cfg.enable_early_termination:
            terminate = terminate | (reset_recovery & ~contact) | ball_passed
            if cfg.reward_type.startswith("return_w_estimate"):
                terminate = terminate | (contact & ~est_bounce_in)
        terminate = terminate | (reset_reaction & ~handoff_ok)

        done = terminate | (progress >= cfg.max_episode_length - 1)
        terminate, done = self._couple_done(terminate, done)
        reset_reaction = reset_reaction & ~done
        reset_recovery = reset_recovery & ~done

        # apply recovery transition (:245-247): tar_action->0, clear bounce
        tar_action = jnp.where(reset_recovery, 0, new_state.tar_action)
        has_bounce2 = jnp.where(reset_recovery, False, new_state.has_bounce)
        bounce_pos2 = jnp.where(reset_recovery[:, None], 0.0,
                                new_state.bounce_pos)

        # apply reaction transition (:216-244): new incoming ball + target
        tt_new = (cfg.reset_reaction_nframes
                  + jax.random.randint(k_tt, (N,), -5, 5)).astype(jnp.int32)
        tgt_new = self._sample_target(k_tar, N)
        rr = reset_reaction

        def sel(new, old):
            d = rr.reshape((N,) + (1,) * (new.ndim - 1))
            return jnp.where(d, new, old)

        new_state = dataclasses.replace(
            new_state,
            tar_action=jnp.where(rr, 1, tar_action),
            tar_time=jnp.where(rr, 0, tar_time),
            tar_time_total=jnp.where(rr, tt_new, new_state.tar_time_total),
            target_bounce=sel(tgt_new, new_state.target_bounce),
            ball_pos=sel(lpos, ball_pos), ball_vel=sel(lvel, ball_vel),
            ball_vspin=jnp.where(rr, lspin, ball_vspin),
            ball_traj=sel(traj_new, ball_traj),
            has_contact=jnp.where(rr, False, contact),
            bounce_in=jnp.where(rr, False, bounce_in),
            est_bounce_pos=sel(jnp.zeros((N, 2)), est_bounce_pos),
            est_bounce_time=jnp.where(rr, 0.0, est_bounce_time),
            est_bounce_in=jnp.where(rr, False, est_bounce_in),
            est_max_height=jnp.where(rr, 0.0, est_max_height),
            has_bounce=has_bounce2, bounce_pos=bounce_pos2,
            mvae=dataclasses.replace(
                new_state.mvae,
                swing_type_cycle=jnp.where(
                    rr, -1, new_state.mvae.swing_type_cycle)),
            reset_buf=done.astype(jnp.int32),
            terminate_buf=terminate.astype(jnp.int32))

        # behavioral stats per step, aggregated by the learner into per-epoch
        # training metrics (reference env-extras stats path,
        # `physics_mvae_controller.py:438-439`): swing cycles end on the
        # reaction→recovery transition or on a terminal miss mid-reaction
        f32 = jnp.float32
        cycle_end = reset_recovery | (done & in_reaction)
        extras = {
            "cycle_end": cycle_end.astype(f32),
            "cycle_hit": (cycle_end & contact).astype(f32),
            "contact_now": contact_now.astype(f32),
            "contact_est_in": (contact_now & est_bounce_in).astype(f32),
            "swing_fh": (cycle_end
                         & (new_state.mvae.swing_type_cycle == 1)).astype(f32),
            "swing_bh": (cycle_end
                         & (new_state.mvae.swing_type_cycle >= 2)).astype(f32),
            "in_reaction": in_reaction.astype(f32),
            # court-gated + clamped (VERDICT r04 weak #3): only frames where
            # the ball is actually in play near this court answer "is the
            # racket getting closer?" — unbounded post-miss flights used to
            # swamp the mean (7947 m spikes). The learner reports
            # median/P90 over the valid set, not a mean.
            "racket_ball_dist": jnp.where(
                in_reaction & ~ball_gone,
                jnp.minimum(jnp.linalg.norm(ball_pos - racket_pos, axis=-1),
                            30.0), jnp.nan),
        }

        return new_state, StepOutput(
            obs=obs, reward=reward, done=done.astype(jnp.int32),
            terminate=terminate.astype(jnp.int32), sub_rewards=subs,
            extras=extras)

    # -- low-level policy obs ----------------------------------------------------

    def _low_level_obs(self, sim, dof_tar, tar_body_pos, tar_body_rot):
        """Imitation-style 734-dim obs for the frozen low-level policy: sim
        state vs kinematic targets (reference `post_mvae_step` computing the
        low-level obs from MVAE targets, humanoid_smpl_im_mvae.py:593-661).
        Uses this player's real gender+betas body channel so the obs matches
        what the policy saw in imitation training."""
        from .obs import compute_imitation_obs

        bp, bq, bl, ba = engine.fk_world(self.model, sim)
        dp = engine.dof_pos(sim)
        dv = engine.dof_vel(sim)
        return compute_imitation_obs(bp, bq, tar_body_pos, tar_body_rot, dp,
                                     dv, dof_tar, bl, ba, self.motion_bodies)
