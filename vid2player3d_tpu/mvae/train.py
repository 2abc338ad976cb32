"""MotionVAE trainer: jitted autoregressive window training.

TPU-native re-design of the reference driver
(`vid2player/motion_vae/base.py:115-320`). The reference runs a Python loop
over the 10-frame window with one Adam step per frame and scheduled sampling
choosing between ground truth and the model's own (detached) prediction as
the next condition. Here the whole window — per-frame forward, loss, grad,
and optimizer update — is one `lax.scan` inside one jit: a single device
program per batch, no host round-trips.

Losses per frame (reference `base.py:234-266`):
  kl    = -0.5 * sum(1 + logvar - mu^2 - e^logvar).clip(max=0) / numel
  recon = future-weighted MSE on features
  phase = future-weighted MSE on (sin, cos) phase * weight (10x)
Scheduled sampling (reference `base.py:296-303`): the probability of running
"regressive" (feed own prediction) ramps linearly between the two
`curriculum_schedule` fractions of total epochs.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils import checkpoint as ckpt
from .config import MVAEOption
from .dataset import PoseSequenceDataset
from .model import PoseMixtureVAE


class MVAETrainer:

    def __init__(self, opt: MVAEOption, dataset: PoseSequenceDataset,
                 dataset_no_phase: Optional[PoseSequenceDataset] = None):
        self.opt = opt
        self.dataset = dataset
        self.dataset_no_phase = dataset_no_phase
        if dataset.avg is None:
            dataset.get_normalization_stats()
        if dataset_no_phase is not None:
            dataset_no_phase.set_normalization_stats(dataset.avg, dataset.std)

        F = dataset.frame_size
        self.frame_size = F
        pred = F + (2 if opt.predict_phase else 0)
        self.model = PoseMixtureVAE(
            frame_size_cond=F, frame_size_truth=F, frame_size_pred=pred,
            latent_size=opt.latent_size, hidden_size=opt.hidden_size,
            num_condition_frames=opt.num_condition_frames,
            num_future_predictions=opt.num_future_predictions,
            num_experts=opt.num_experts)

        key = jax.random.PRNGKey(opt.seed)
        S, T = opt.num_future_predictions, opt.num_condition_frames
        self.params = self.model.init(
            key, jnp.zeros((1, S * F)), jnp.zeros((1, T * F)), key)["params"]
        self.tx = optax.inject_hyperparams(optax.adam)(learning_rate=opt.lr)
        self.opt_state = self.tx.init(self.params)
        self._np_rng = np.random.default_rng(opt.seed + 1)
        self._key = jax.random.PRNGKey(opt.seed + 2)

        if opt.softmax_future:
            self.future_weights = jax.nn.softmax(jnp.linspace(1, 0, S))
        else:
            self.future_weights = jnp.full((S,), 1.0 / S)
        self.epoch = 0

    # -- one jitted batch = the full autoregressive window ------------------

    @functools.partial(jax.jit, static_argnums=0)
    def _train_window(self, params, opt_state, feat, phase, key, regressive,
                      phase_w, lr):
        return self._train_window_body(params, opt_state, feat, phase, key,
                                       regressive, phase_w, lr)

    def _train_window_body(self, params, opt_state, feat, phase, key,
                           regressive, phase_w, lr):
        """feat (B,L,F) normalized; phase (B,L,2); regressive: bool scalar;
        phase_w: scalar phase-loss weight (0 on unlabeled batches)."""
        opt = self.opt
        B, L, F = feat.shape
        T, S = opt.num_condition_frames, opt.num_future_predictions
        opt_state.hyperparams["learning_rate"] = lr
        w = self.opt.weights

        def loss_fn(p, cond, gt_feat, gt_phase, rng):
            out, mu, logvar = self.model.apply(
                {"params": p}, gt_feat.reshape(B, S * F),
                cond.reshape(B, T * F), rng)
            if opt.predict_phase:
                out = out.reshape(B, S, F + 2)
                out_phase, out_feat = out[..., -2:], out[..., :-2]
            else:
                out_feat = out.reshape(B, S, F)
                out_phase = jnp.zeros((B, S, 2), feat.dtype)
            # clamp the inner sum (<=0 analytically) BEFORE the -0.5 factor,
            # matching `(...).sum().clamp(max=0)` in reference base.py:252
            inner = jnp.sum(1 + logvar - mu**2 - jnp.exp(logvar))
            kl = -0.5 * jnp.clip(inner, max=0.0) / logvar.size
            recon = jnp.mean((out_feat - gt_feat) ** 2, axis=(0, 2))
            recon = jnp.sum(recon * self.future_weights)
            ph = jnp.mean((out_phase - gt_phase) ** 2, axis=(0, 2))
            ph = jnp.sum(ph * self.future_weights)
            losses = {"recon": recon * w["recon"], "kl": kl * w["kl"],
                      "recon_phase": ph * phase_w}
            return sum(losses.values()), (losses, out_feat[:, 0])

        def step(carry, j):
            p, ost, cond, prev = carry
            i = T - 1 + j
            rolled = jnp.roll(cond, -1, axis=1)
            last = jnp.where(regressive, jax.lax.stop_gradient(prev),
                             jax.lax.dynamic_index_in_dim(
                                 feat, i, axis=1, keepdims=False))
            cond = jnp.where(j > 0, rolled.at[:, -1].set(last), cond)
            gt_feat = jax.lax.dynamic_slice_in_dim(feat, i + 1, S, axis=1)
            gt_phase = jax.lax.dynamic_slice_in_dim(phase, i + 1, S, axis=1)
            rng = jax.random.fold_in(key, j)
            grads, (losses, pred0) = jax.grad(loss_fn, has_aux=True)(
                p, cond, gt_feat, gt_phase, rng)
            updates, ost = self.tx.update(grads, ost, p)
            p = optax.apply_updates(p, updates)
            return (p, ost, cond, pred0), losses

        cond0 = feat[:, :T]
        prev0 = jnp.zeros((B, F), feat.dtype)
        nsteps = L - S - T + 1
        (params, opt_state, _, _), losses = jax.lax.scan(
            step, (params, opt_state, cond0, prev0), jnp.arange(nsteps))
        mean_losses = {k: jnp.mean(v) for k, v in losses.items()}
        return params, opt_state, mean_losses

    # -- host-side schedules (reference base.py:296-320) --------------------

    def _regressive(self, epoch: int) -> bool:
        sched = self.opt.curriculum_schedule
        if sched is None:
            return True
        total = self.opt.n_epochs + self.opt.n_epochs_decay
        lo, hi = int(total * sched[0]), int(total * sched[1])
        thresh = min(hi - lo, max(0, epoch - lo)) / max(hi - lo, 1)
        return self._np_rng.random() <= thresh

    def _sample_phase(self, epoch: int) -> bool:
        sched = self.opt.mixed_phase_schedule
        if sched is None:
            return True
        (e1, t1), (e2, t2) = sched
        total = self.opt.n_epochs + self.opt.n_epochs_decay
        lo, hi = int(total * e1), int(total * e2)
        p = min(hi - lo, max(0, epoch - lo)) / max(hi - lo, 1)
        return self._np_rng.random() <= t1 + (t2 - t1) * p

    def current_lr(self) -> float:
        decay = max(0, self.epoch - self.opt.n_epochs)
        return self.opt.lr * max(0.0, 1.0 - decay / self.opt.n_epochs_decay)

    @functools.partial(jax.jit, static_argnums=0)
    def _train_fused(self, params, opt_state, feats, phases, key, regs,
                     phase_ws, lr):
        """K batches in ONE device program: lax.scan over the stacked batch
        axis, each step = the full `_train_window` body. On the tunneled TPU
        one small dispatch costs ~50-100 ms host round-trip, so an epoch of
        500 separate window calls is latency-bound; fusing K per call
        amortizes it K-fold (same math, same update order)."""
        def body(carry, x):
            p, ost = carry
            feat, phase, reg, pw, k = x
            p, ost, losses = self._train_window_body(
                p, ost, feat, phase, k, reg, pw, lr)
            return (p, ost), losses

        K = feats.shape[0]
        keys = jax.random.split(key, K)
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (feats, phases, regs, phase_ws, keys))
        return params, opt_state, {k: jnp.mean(v) for k, v in losses.items()}

    def train_epoch(self, batches_per_epoch: Optional[int] = None,
                    fuse: int = 16) -> Dict[str, float]:
        opt = self.opt
        nb = batches_per_epoch or max(1, opt.nseqs // opt.batch_size)
        acc: Dict[str, float] = {}
        done = 0
        lr = jnp.asarray(self.current_lr(), jnp.float32)
        while done < nb:
            k = min(fuse, nb - done)
            feats, phases, regs, pws = [], [], [], []
            for _ in range(k):
                use_phase = self._sample_phase(self.epoch)
                ds = self.dataset if (use_phase
                                      or self.dataset_no_phase is None
                                      ) else self.dataset_no_phase
                feat, phase = ds.sample_batch(opt.batch_size)
                feats.append(feat), phases.append(phase)
                regs.append(self._regressive(self.epoch))
                pws.append(opt.weights.get("recon_phase", 0.0) if (
                    opt.predict_phase and use_phase) else 0.0)
            self._key, sub = jax.random.split(self._key)
            self.params, self.opt_state, losses = self._train_fused(
                self.params, self.opt_state,
                jnp.asarray(np.stack(feats)), jnp.asarray(np.stack(phases)),
                sub, jnp.asarray(regs), jnp.asarray(pws, jnp.float32), lr)
            for kk, v in losses.items():
                acc[kk] = acc.get(kk, 0.0) + float(v) * k / nb
            done += k
        self.epoch += 1
        return acc

    # -- inference + IO ------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def decode(self, params, z, cond):
        """Batched controller-inference decode (reference `base.py:390-407`);
        returns (next_frame_features, phase_sincos)."""
        out = self.model.apply({"params": params}, z, cond,
                               method=PoseMixtureVAE.sample)
        S, F = self.opt.num_future_predictions, self.frame_size
        if self.opt.predict_phase:
            out = out.reshape(out.shape[0], S, F + 2)
            return out[:, 0, :-2], out[:, 0, -2:]
        out = out.reshape(out.shape[0], S, F)
        return out[:, 0], jnp.zeros((out.shape[0], 2), out.dtype)

    def save_checkpoint(self, label: str = "latest"):
        d = os.path.join(self.opt.checkpoint_dir, self.opt.model_ver)
        os.makedirs(d, exist_ok=True)
        ckpt.save_pytree(os.path.join(d, f"{label}.npz"), self.params)
        np.save(os.path.join(d, "avg.npy"), self.dataset.avg)
        np.save(os.path.join(d, "std.npy"), self.dataset.std)
        # raw dataset frames for rollout/tennis-env init conditions — the
        # reference loads init conditions from the dataset at controller
        # build time (`mvae_player.py:112-158`); persisting them with the
        # checkpoint lets tennis runs start from REAL dataset states without
        # re-reading the dataset
        np.save(os.path.join(d, "init_frames.npy"),
                self.dataset.raw_init_frames(256))

    def load_checkpoint(self, label: str = "latest"):
        d = os.path.join(self.opt.checkpoint_dir, self.opt.model_ver)
        self.params = ckpt.load_pytree(os.path.join(d, f"{label}.npz"),
                                       self.params)
        self.dataset.set_normalization_stats(
            np.load(os.path.join(d, "avg.npy")),
            np.load(os.path.join(d, "std.npy")))
