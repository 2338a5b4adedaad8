"""Adversarial autoencoder (AAE) on SLF maps.

The reference ships an AAE sketch that is dead code — its `__init__`
references undefined variables and `train_step` is truncated mid-function
(`deep_prior/networks/aae.py:182-237`, SURVEY.md §2.3).  This is the
working completion of that capability: an encoder/decoder pair with a
latent discriminator that pushes q(z|x) toward the N(0, I) prior
(Makhzani et al., the architecture the sketch names).

Training objective (training/aae_trainer.py):
  reconstruction:  ||x - D(E(x))||^2
  regularization:  adversarial game on z — latent discriminator separates
                   z_real ~ N(0, I) from z_fake = E(x); the encoder is
                   additionally updated to fool it.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from quantized_spectrum_cartography_tpu.models.ae import Decoder, Encoder


class LatentDiscriminator(nn.Module):
    """MLP z -> P(z is from the prior), the `create_discriminator`
    width-halving stack of the reference's builders
    (deep_prior/networks/model_utils.py:200-233)."""

    width: int = 128
    depth: int = 3

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        x = z
        w = self.width
        for _ in range(self.depth):
            x = nn.leaky_relu(nn.Dense(max(w, 8))(x), 0.2)
            w //= 2
        return nn.sigmoid(nn.Dense(1)(x))[..., 0]


class AAEEncoder(nn.Module):
    """Conv encoder [B,51,51,1] -> z [B, z_dim] (deterministic posterior)."""

    z_dim: int = 64
    activation: str = "leaky_relu"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = Encoder(activation=self.activation)(x, train)
        return nn.Dense(self.z_dim)(h)


class AAEDecoder(nn.Module):
    """z [B, z_dim] -> map [B,51,51,1]; doubles as a generative prior
    (sample z ~ N(0,I)) once the adversarial game has matched the
    aggregate posterior to the prior."""

    z_dim: int = 64
    activation: str = "leaky_relu"

    @nn.compact
    def __call__(self, z: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = nn.Dense(256)(z)
        return Decoder(activation=self.activation)(h, train)
