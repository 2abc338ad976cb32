"""Fused forward-kinematics chain as a Pallas TPU kernel.

The hierarchical tennis step needs world body poses from the MVAE's local
joint rotations every frame (`envs/tennis.py _kinematic_targets`, the
reference's `_smpl_to_sim` FK, `humanoid_smpl_im_mvae.py:928-946`). As
stock JAX ops the 23-step parent chain lowers to hundreds of tiny
sequential VPU kernels — measured at 7+ ms for 4096 envs on a v5e, ~30% of
the whole fused step — because each 3-vector/3x3 op is its own launch.

Here the entire chain runs inside ONE Pallas kernel per env-block: arrays
arrive env-minor (joint/row/col major, env on the lane axis), the 24-joint
tree walk is fully unrolled in-register, and each (B,) lane vector is a
contiguous VMEM row. No MXU involvement — this is pure VPU elementwise.

Grid: 1-D over env blocks. VMEM per block at B=1024: inputs 24*9+24*3+3 =
~1.1 MB, outputs 24*12 = ~1.2 MB — far under the 16 MB budget.

Differentiation: the kernel is used in the PPO env step which is never
differentiated (policy-gradient; only the policy network sees grads), so no
custom VJP is defined — taking grads through it fails loudly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _on_cpu() -> bool:
    from ..utils.runtime import on_cpu

    return on_cpu()


def fk_chain(rot, off, root_pos, parents, block: int = 1024):
    """World-space FK over a topologically-ordered joint tree.

    rot (N, J, 3, 3) local rotation matrices (row 0 = root orientation),
    off (N, J, 3) parent-relative rest offsets, root_pos (N, 3),
    parents: length-J int sequence, parents[0] ignored.

    Returns (body_pos (N, J, 3), body_rotmat (N, J, 3, 3)).
    """
    parents = tuple(int(p) for p in parents)
    N, J = rot.shape[0], rot.shape[1]
    if _on_cpu() or N < 256:
        return _fk_plain(rot, off, root_pos, parents)

    B = min(block, N)
    pad = (-N) % B
    if pad:
        z3 = jnp.zeros((pad, J, 3), rot.dtype)
        rot = jnp.concatenate(
            [rot, jnp.broadcast_to(jnp.eye(3, dtype=rot.dtype),
                                   (pad, J, 3, 3))], 0)
        off = jnp.concatenate([off, z3], 0)
        root_pos = jnp.concatenate(
            [root_pos, jnp.zeros((pad, 3), rot.dtype)], 0)
    Np = N + pad

    # env-minor layout: the env axis is the (contiguous) lane axis
    rt = jnp.transpose(rot, (1, 2, 3, 0))        # (J,3,3,Np)
    ot = jnp.transpose(off, (1, 2, 0))           # (J,3,Np)
    rp = jnp.transpose(root_pos, (1, 0))         # (3,Np)

    pos_t, rm_t = _fk_pallas(rt, ot, rp, parents=parents, J=J, block=B)
    body_pos = jnp.transpose(pos_t, (2, 0, 1))[:N]
    body_rm = jnp.transpose(rm_t, (3, 0, 1, 2))[:N]
    return body_pos, body_rm


@functools.partial(jax.jit,
                   static_argnames=("parents", "J", "block", "interpret"))
def _fk_pallas(rt, ot, rp, *, parents, J, block, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Np = rt.shape[-1]

    def kernel(rt_ref, ot_ref, rp_ref, pos_ref, rm_ref):
        # root
        gR = [tuple(tuple(rt_ref[0, a, b, :] for b in range(3))
                    for a in range(3))]
        gp = [tuple(rp_ref[i, :] for i in range(3))]
        for j in range(1, J):
            p = parents[j]
            Rp, pp = gR[p], gp[p]
            o = tuple(ot_ref[j, i, :] for i in range(3))
            gp.append(tuple(
                pp[a] + Rp[a][0] * o[0] + Rp[a][1] * o[1] + Rp[a][2] * o[2]
                for a in range(3)))
            rj = tuple(tuple(rt_ref[j, a, b, :] for b in range(3))
                       for a in range(3))
            gR.append(tuple(tuple(
                Rp[a][0] * rj[0][b] + Rp[a][1] * rj[1][b]
                + Rp[a][2] * rj[2][b] for b in range(3)) for a in range(3)))
        for j in range(J):
            for a in range(3):
                pos_ref[j, a, :] = gp[j][a]
                for b in range(3):
                    rm_ref[j, a, b, :] = gR[j][a][b]

    grid = (Np // block,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((J, 3, 3, block), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((J, 3, block), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((J, 3, block), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((J, 3, 3, block), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((J, 3, rt.shape[-1]), rt.dtype),
            jax.ShapeDtypeStruct((J, 3, 3, rt.shape[-1]), rt.dtype),
        ],
        interpret=interpret,
    )(rt, ot, rp)


def _fk_plain(rot, off, root_pos, parents):
    """Reference implementation (also the CPU / small-batch path)."""
    from ..physics import soa

    def mat_of(j):
        return tuple(tuple(rot[:, j, a, b] for b in range(3))
                     for a in range(3))

    gR = [mat_of(0)]
    gp = [soa.unpack(root_pos)]
    for j in range(1, len(parents)):
        p = parents[j]
        gp.append(soa.v_add(gp[p], soa.m_vec(gR[p], soa.unpack(off[:, j]))))
        gR.append(soa.m_mul(gR[p], mat_of(j)))
    body_pos = jnp.stack([soa.pack(v) for v in gp], axis=1)
    body_rm = jnp.stack([soa.pack_m33(m) for m in gR], axis=1)
    return body_pos, body_rm
