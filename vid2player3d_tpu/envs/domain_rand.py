"""Domain randomization engine.

Re-design of the reference's randomization machinery
(`embodied_pose/env/tasks/base_task.py:250-445 apply_randomizations`): the
reference mutates PhysX actor/sim properties in-place between episodes; here
the physics model is already a *pytree of per-env arrays*
(`physics/model.py ArticulationModel`), so randomization is a pure function
`model -> model'` drawing per-env perturbations — no recompilation, no
host↔device traffic, and it composes with `vmap`/`shard_map` for free.

Supported targets mirror the reference's `randomization_params` tree:
  - model fields (body_mass, kp, kd, armature, contact_radius, …) with
    uniform / gaussian / loguniform draws, additive or scaling application
  - observations / actions (per-step noise, `base_task.py:262-287`)
  - linear schedules ramping perturbation strength over policy steps
    (`base_task.py:300-330 sched_scaling`)
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RandSpec:
    """One randomized property (reference `randomization_params` leaf)."""
    field: str                    # ArticulationModel field, "observations" or "actions"
    distribution: str = "uniform"  # uniform | gaussian | loguniform
    rng: Tuple[float, float] = (0.0, 0.0)   # (lo, hi) or (mean, std)
    operation: str = "scaling"    # scaling | additive
    schedule: str = "constant"    # constant | linear
    schedule_steps: int = 1       # policy steps to reach full strength


_MODEL_FIELDS = ("joint_pos", "body_com", "body_mass", "body_inertia",
                 "kp", "kd", "torque_lim", "armature",
                 "contact_offset", "contact_radius")

# tennis-ball physical constants (`tennis/ball.py BallParams`), the analog of
# the reference randomizing actor shape properties of the ball URDF
# (`base_task.py:350-430` actor_properties); spec field = "ball_<name>"
_BALL_FIELDS = ("mass", "radius", "base_cd", "restitution", "friction",
                "spin_scale")


def _sched_scale(spec: RandSpec, step) -> jnp.ndarray:
    if spec.schedule == "linear":
        return jnp.clip(step / float(max(spec.schedule_steps, 1)), 0.0, 1.0)
    return jnp.asarray(1.0)


def _draw(key, spec: RandSpec, shape, step):
    """Sample the perturbation factor/offset with schedule applied.

    Scheduling attenuates toward the identity of the operation: additive
    offsets shrink to 0, scaling factors shrink to 1 (`base_task.py:300-330`).
    """
    lo, hi = spec.rng
    if spec.distribution == "uniform":
        x = jax.random.uniform(key, shape, minval=lo, maxval=hi)
    elif spec.distribution == "gaussian":
        x = lo + hi * jax.random.normal(key, shape)
    elif spec.distribution == "loguniform":
        llo, lhi = jnp.log(jnp.asarray(lo)), jnp.log(jnp.asarray(hi))
        x = jnp.exp(jax.random.uniform(key, shape, minval=llo, maxval=lhi))
    else:
        raise ValueError(f"unknown distribution {spec.distribution!r}")
    s = _sched_scale(spec, step)
    ident = 1.0 if spec.operation == "scaling" else 0.0
    return ident + s * (x - ident)


def _apply(value, factor, operation: str):
    return value * factor if operation == "scaling" else value + factor


class DomainRandomizer:
    """Holds the spec list; all methods are pure and jit-safe."""

    def __init__(self, specs: Sequence[RandSpec]):
        ball = tuple("ball_" + f for f in _BALL_FIELDS)
        for sp in specs:
            if sp.field not in _MODEL_FIELDS + ball + ("observations",
                                                       "actions"):
                raise ValueError(f"unknown randomization target {sp.field!r}")
        self.specs = tuple(specs)
        self.model_specs = tuple(s for s in specs if s.field in _MODEL_FIELDS)
        self.ball_specs = tuple(s for s in specs if s.field in ball)
        self.obs_specs = tuple(s for s in specs if s.field == "observations")
        self.act_specs = tuple(s for s in specs if s.field == "actions")

    def randomize_model(self, key, model, step=0):
        """Per-env perturbed copy of the articulation model.

        Draws are per-env (broadcast over the property's trailing dims), the
        reference granularity: one multiplier per actor property per env."""
        if not self.model_specs:
            return model
        updates = {}
        for i, sp in enumerate(self.model_specs):
            k = jax.random.fold_in(key, i)
            value = getattr(model, sp.field)
            factor = _draw(k, sp, (value.shape[0],) + (1,) * (value.ndim - 1),
                           step).astype(value.dtype)
            updates[sp.field] = _apply(value, factor, sp.operation)
        return dataclasses.replace(model, **updates)

    def randomize_ball(self, key, params, step=0):
        """Per-epoch scalar perturbation of the tennis-ball constants
        (`tennis/ball.py BallParams` NamedTuple). One shared draw per field —
        the reference likewise randomizes shape properties once per
        randomization event, not per env (`base_task.py:350-430`)."""
        if not self.ball_specs:
            return params
        updates = {}
        for i, sp in enumerate(self.ball_specs):
            k = jax.random.fold_in(key, 3000 + i)
            name = sp.field[len("ball_"):]
            factor = _draw(k, sp, (), step)
            updates[name] = _apply(getattr(params, name), factor, sp.operation)
        return params._replace(**updates)

    def randomize_obs(self, key, obs, step=0):
        """Per-element observation noise (`base_task.py:262-274`)."""
        for i, sp in enumerate(self.obs_specs):
            k = jax.random.fold_in(key, 1000 + i)
            obs = _apply(obs, _draw(k, sp, obs.shape, step).astype(obs.dtype),
                         sp.operation)
        return obs

    def randomize_actions(self, key, actions, step=0):
        """Per-element action noise (`base_task.py:276-287`)."""
        for i, sp in enumerate(self.act_specs):
            k = jax.random.fold_in(key, 2000 + i)
            actions = _apply(
                actions, _draw(k, sp, actions.shape, step).astype(actions.dtype),
                sp.operation)
        return actions
