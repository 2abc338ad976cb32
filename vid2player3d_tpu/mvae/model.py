"""Conditional mixture-of-experts motion VAE in flax.

TPU-native re-design of the reference's EA character-motion-vaes zoo
(`vid2player/motion_vae/model.py:122-297`):

- `Encoder`: skip-concat MLP — the truth frame is re-concatenated in front of
  every hidden layer (reference `model.py:143-147`).
- `MoEDecoder`: a gating MLP produces softmax expert coefficients; each layer
  blends per-expert weight matrices with the coefficients and applies the
  blended matrix (reference `model.py:237-250` uses `baddbmm`). Here the
  blend+apply is the fused `ops.moe_linear` Pallas kernel on TPU (expert
  matrices resident in VMEM, batch tiles streamed through the MXU with no HBM
  intermediates); pure-jnp apply-then-blend elsewhere.
- `PoseMixtureVAE` ties them together (reference `model.py:255-297`).

Latent size 32, hidden 256, 6 experts by default (reference
`motion_vae/config.py:19-24`).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class Encoder(nn.Module):
    latent_size: int
    hidden_size: int

    @nn.compact
    def __call__(self, x, c) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: flattened future truth (B, S*F_truth); c: flattened condition
        (B, T*F_cond). Returns (mu, logvar)."""
        h1 = nn.elu(nn.Dense(self.hidden_size, name="fc1")(
            jnp.concatenate([x, c], axis=-1)))
        h2 = nn.elu(nn.Dense(self.hidden_size, name="fc2")(
            jnp.concatenate([x, h1], axis=-1)))
        s = jnp.concatenate([x, h2], axis=-1)
        mu = nn.Dense(self.latent_size, name="mu")(s)
        logvar = nn.Dense(self.latent_size, name="logvar")(s)
        return mu, logvar


class MoELayer(nn.Module):
    """One blended-expert linear layer: softmax-coefficient-weighted mixture
    of `num_experts` weight matrices (reference `model.py:237-250`)."""
    num_experts: int
    in_size: int
    out_size: int

    @nn.compact
    def __call__(self, coeff, h):
        w = self.param("w", nn.initializers.he_uniform(),
                       (self.num_experts, self.in_size, self.out_size))
        b = self.param("b", nn.initializers.constant(0.01),
                       (self.num_experts, self.out_size))
        # fused Pallas kernel on TPU (expert matrices resident in VMEM, batch
        # tiles streamed, zero HBM intermediates); jnp fallback elsewhere
        from vid2player3d_tpu.ops import moe_linear
        return moe_linear(h, coeff, w, b)


class MoEDecoder(nn.Module):
    frame_size_cond: int
    frame_size_out: int
    latent_size: int
    hidden_size: int
    num_condition_frames: int
    num_future_predictions: int
    num_experts: int
    gate_hsize: int = 64

    @nn.compact
    def __call__(self, z, c):
        input_size = self.latent_size + self.frame_size_cond * self.num_condition_frames
        inter_size = self.latent_size + self.hidden_size
        output_size = self.num_future_predictions * self.frame_size_out

        zc = jnp.concatenate([z, c], axis=-1)
        g = nn.elu(nn.Dense(self.gate_hsize, name="gate1")(zc))
        g = nn.elu(nn.Dense(self.gate_hsize, name="gate2")(g))
        coeff = jax.nn.softmax(nn.Dense(self.num_experts, name="gate3")(g),
                               axis=-1)

        h = c
        h = nn.elu(MoELayer(self.num_experts, input_size,
                            self.hidden_size, name="moe0")(
                                coeff, jnp.concatenate([z, h], axis=-1)))
        h = nn.elu(MoELayer(self.num_experts, inter_size,
                            self.hidden_size, name="moe1")(
                                coeff, jnp.concatenate([z, h], axis=-1)))
        out = MoELayer(self.num_experts, inter_size, output_size,
                       name="moe2")(coeff, jnp.concatenate([z, h], axis=-1))
        return out


class PoseMixtureVAE(nn.Module):
    """Conditional MoE VAE over per-frame motion features.

    `frame_size_pred` may exceed `frame_size_cond` when phase (sin,cos) is
    appended to the prediction (reference `base.py:36-38`).
    """
    frame_size_cond: int
    frame_size_truth: int
    frame_size_pred: int
    latent_size: int = 32
    hidden_size: int = 256
    num_condition_frames: int = 1
    num_future_predictions: int = 1
    num_experts: int = 6

    def setup(self):
        self.encoder = Encoder(self.latent_size, self.hidden_size)
        self.decoder = MoEDecoder(
            self.frame_size_cond, self.frame_size_pred, self.latent_size,
            self.hidden_size, self.num_condition_frames,
            self.num_future_predictions, self.num_experts)

    def __call__(self, x, c, rng):
        """Train forward: encode truth+condition, reparameterize, decode."""
        mu, logvar = self.encoder(x, c)
        eps = jax.random.normal(rng, mu.shape, mu.dtype)
        z = mu + eps * jnp.exp(0.5 * logvar)
        return self.decoder(z, c), mu, logvar

    def encode(self, x, c):
        return self.encoder(x, c)

    def sample(self, z, c):
        """Controller inference path: decode given latent + condition
        (reference `base.py:390-407`)."""
        return self.decoder(z, c)
