"""Context-corruption transforms for the imitation task.

Re-design of `embodied_pose/env/tasks/humanoid_smpl_im.py:565-592
_transform_target`: the motion context fed to the imitation policy can be
degraded to mimic video-estimated poses — fixed joint masking, confidence-
weighted Gaussian noise with occlusion, and random joint dropout. All three
are pure jit-safe functions over fixed-shape arrays: occlusion/drop decisions
are `where` masks keyed by per-call PRNG keys, never boolean indexing.

The transforms produce a `joint_conf` (N, L, J) channel alongside the
corrupted positions, matching the reference where confidence joins the
context features consumed by the network's IK stage.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.smpl import SMPL_BONE_ORDER_NAMES

_SQRT3 = 1.7320508075688772


@dataclasses.dataclass(frozen=True)
class TransformSpecs:
    """Which corruptions to apply, mirroring the YAML `transform_specs` tree.

    mask_joints: zero out these named joints entirely.
    noisy_joints_*: Gaussian noise on a Bernoulli(prob) subset with
      cdf-derived confidence; joints whose confidence falls below `min_conf`
      are treated as occluded (conf and position zeroed).
    mask_random_joints_prob: iid dropout of non-root joints.
    """
    mask_joints: Sequence[str] = ()
    noisy_joints_prob: float = 0.0
    noisy_joints_noise_std: float = 0.0
    noisy_joints_conf_std: float = 0.02
    noisy_joints_min_conf: float = 0.0
    mask_random_joints_prob: float = 0.0

    @property
    def active(self) -> bool:
        return (len(self.mask_joints) > 0 or self.noisy_joints_prob > 0.0
                or self.mask_random_joints_prob > 0.0)


def corrupt_body_pos(key, body_pos: jnp.ndarray,
                     specs: Optional[TransformSpecs],
                     body_names: Sequence[str] = tuple(SMPL_BONE_ORDER_NAMES),
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply the configured corruptions to (..., J, 3) joint positions.

    Returns (corrupted positions, joint confidence (..., J)). With
    `specs=None` this is the identity with all-ones confidence.
    """
    conf = jnp.ones(body_pos.shape[:-1], body_pos.dtype)
    if specs is None or not specs.active:
        return body_pos, conf

    if len(specs.mask_joints) > 0:
        idx = jnp.asarray([list(body_names).index(j)
                           for j in specs.mask_joints])
        conf = conf.at[..., idx].set(0.0)
        body_pos = body_pos * conf[..., None]

    if specs.noisy_joints_prob > 0.0:
        k_sel, k_noise = jax.random.split(key)
        selected = jax.random.bernoulli(
            k_sel, specs.noisy_joints_prob, conf.shape)
        std = jnp.where(selected, specs.noisy_joints_noise_std, 0.0)
        noise = jax.random.normal(k_noise, body_pos.shape,
                                  body_pos.dtype) * std[..., None]
        noise_norm = jnp.linalg.norm(noise, axis=-1) / (
            _SQRT3 * specs.noisy_joints_conf_std)
        new_conf = (1.0 - jax.scipy.stats.norm.cdf(noise_norm)) * 2.0
        body_pos = body_pos + noise
        conf = jnp.where(selected, new_conf, conf)
        occluded = conf < specs.noisy_joints_min_conf
        conf = jnp.where(occluded, 0.0, conf)
        body_pos = jnp.where(occluded[..., None],
                             jnp.zeros_like(body_pos), body_pos)

    if specs.mask_random_joints_prob > 0.0:
        k_drop = jax.random.fold_in(key, 7)
        drop = jax.random.bernoulli(
            k_drop, specs.mask_random_joints_prob, conf.shape)
        drop = drop.at[..., 0].set(False)  # never drop the root
        conf = jnp.where(drop, 0.0, conf)
        body_pos = jnp.where(drop[..., None],
                             jnp.zeros_like(body_pos), body_pos)

    return body_pos, conf
