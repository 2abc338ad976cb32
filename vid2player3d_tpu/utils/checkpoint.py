"""Checkpoint IO + cross-stage weight surgery.

TPU-native replacement for the reference's rl_games `.pth` checkpoints and
its curriculum weight surgery:

- save/load: a pytree of arrays goes to a single `.npz` with slash-joined key
  paths (readable, diff-able, no pickle). Mirrors rl_games
  `torch_ext.save_checkpoint` usage (`im_agent.py:255-266`).
- surgery: when curriculum stages grow the observation or action dims, the
  first-layer kernel gains zero rows and the output layer gains zero rows /
  bias entries (reference `vid2player/agents/v2p_agent.py:46-96`), so the new
  policy starts exactly equal to the old one on the old input slice.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np


def _decode(arr: np.ndarray) -> np.ndarray:
    """Checkpoints written before the bf16→f32 save conversion contain raw
    2-byte void leaves (npz cannot represent ml_dtypes.bfloat16) — recover
    them by reinterpreting the bytes."""
    if arr.dtype.kind == "V" and arr.dtype.itemsize == 2:
        import ml_dtypes

        return arr.view(ml_dtypes.bfloat16)
    return arr


def _flatten(tree: Any) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p))))
            for p in path)
        arr = np.asarray(leaf)
        if str(arr.dtype) == "bfloat16":
            # npz stores bf16 as raw void bytes that cannot round-trip;
            # save f32, the loader casts back to the template leaf's dtype
            arr = arr.astype(np.float32)
        flat[key] = arr
    return flat


def save_pytree(path: str, tree: Any) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **_flatten(tree))


def load_pytree(path: str, like: Any) -> Any:
    """Restore into the structure of `like` (shapes must match except where
    surgery is applied afterwards)."""
    data = np.load(path)
    flat_like = _flatten(like)
    missing = [k for k in flat_like if k not in data.files]
    if missing:
        raise KeyError(f"checkpoint {path} missing keys: {missing[:5]}")
    leaves_paths = jax.tree_util.tree_flatten_with_path(like)[0]
    treedef = jax.tree_util.tree_structure(like)
    out = []
    for path_keys, leaf in leaves_paths:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p))))
            for p in path_keys)
        out.append(_decode(np.asarray(data[key])).astype(
            np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


def load_pytree_with_surgery(path: str, like: Any,
                             fill_overrides: Dict[str, float] = None) -> Any:
    """Like `load_pytree`, but 2-D kernels whose input dim grew are zero-
    padded at the bottom (new obs features contribute nothing initially) and
    kernels/biases whose output dim grew are zero-padded on the right (new
    action dims start at zero) — reference `v2p_agent.py:60-88`.

    A leaf with one MISSING leading axis (e.g. a single-policy checkpoint
    loaded into a dual `num_policies=2` stacked-params tree) is tiled across
    that axis first, so each lane warm-starts from the same pretrained net
    (the reference loads per-player single checkpoints into each dual net,
    `v2p_player.py:21-111`).

    fill_overrides: {key-substring: fill value} — pads matching leaves with
    that value instead of 0 (e.g. running-norm `var` pads with 1 so new obs
    dims normalize as unit variance instead of exploding)."""
    data = np.load(path)
    fill_overrides = fill_overrides or {}
    leaves_paths = jax.tree_util.tree_flatten_with_path(like)[0]
    treedef = jax.tree_util.tree_structure(like)
    out = []
    for path_keys, leaf in leaves_paths:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p))))
            for p in path_keys)
        tgt = np.asarray(leaf)
        if key not in data.files:
            out.append(tgt)  # brand-new parameter: keep fresh init
            continue
        src = _decode(np.asarray(data[key]))
        if src.ndim == tgt.ndim - 1 and tgt.ndim >= 1:
            src = np.repeat(src[None], tgt.shape[0], axis=0)
        if src.shape != tgt.shape:
            fill = 0.0
            for sub, v in fill_overrides.items():
                if sub in key:
                    fill = v
            src = _pad_to(src, tgt.shape, fill)
        out.append(src.astype(tgt.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


def _pad_to(src: np.ndarray, shape, fill: float = 0.0) -> np.ndarray:
    if src.ndim != len(shape) or any(s > t for s, t in zip(src.shape, shape)):
        raise ValueError(f"cannot pad {src.shape} -> {tuple(shape)}")
    pad = [(0, t - s) for s, t in zip(src.shape, shape)]
    return np.pad(src, pad, constant_values=fill)
