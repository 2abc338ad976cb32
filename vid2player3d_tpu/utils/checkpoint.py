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


def _flatten(tree: Any) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p))))
            for p in path)
        flat[key] = np.asarray(leaf)
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
        out.append(np.asarray(data[key]).astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


def load_pytree_with_surgery(path: str, like: Any) -> Any:
    """Like `load_pytree`, but 2-D kernels whose input dim grew are zero-
    padded at the bottom (new obs features contribute nothing initially) and
    kernels/biases whose output dim grew are zero-padded on the right (new
    action dims start at zero) — reference `v2p_agent.py:60-88`."""
    data = np.load(path)
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
        src = np.asarray(data[key])
        if src.shape != tgt.shape:
            src = _pad_to(src, tgt.shape)
        out.append(src.astype(tgt.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


def _pad_to(src: np.ndarray, shape) -> np.ndarray:
    if src.ndim != len(shape) or any(s > t for s, t in zip(src.shape, shape)):
        raise ValueError(f"cannot pad {src.shape} -> {tuple(shape)}")
    pad = [(0, t - s) for s, t in zip(src.shape, shape)]
    return np.pad(src, pad)
