"""Variational autoencoder (+ beta variant) over SLF maps.

Re-design of `deep_prior/networks/vae.py:38-489` (a pytorch-lightning
module with dict-driven conv architecture, mean/log-std heads, reparam
trick, BCE data term and exp-stabilized KL; betaVAE overrides the
criterion with beta * KL, vae.py:433-489).  The lightning scaffolding is
replaced by pure functions + the training loop in training/vae_trainer.py.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from quantized_spectrum_cartography_tpu.models.ae import Decoder, Encoder


class VAE(nn.Module):
    latent_dim: int = 64
    activation: str = "leaky_relu"
    beta: float = 1.0      # beta=1 -> plain VAE; >1 -> betaVAE (vae.py:433)
    head: str = "sigmoid"  # decoder output head (models/ae.Decoder.head);
                           # non-sigmoid heads pair with an MSE data term
    dec_width: int = 16    # decoder base width (channel multiplier)
    refine_width: int = 0  # full-resolution refinement block width

    def setup(self):
        self.encoder = Encoder(activation=self.activation)
        self.mean_head = nn.Dense(self.latent_dim)       # vae.py:82
        self.logstd_head = nn.Dense(self.latent_dim)     # vae.py:83
        self.latent_up = nn.Dense(256)
        self.decoder = Decoder(activation=self.activation, head=self.head,
                               base_width=self.dec_width,
                               refine_width=self.refine_width)

    def encode(self, x, train: bool = False):
        h = self.encoder(x, train)
        return self.mean_head(h), self.logstd_head(h)

    def reparameterize(self, key, mean, logstd):
        """z = mean + exp(logstd) * eps  (vae.py:122-144)."""
        eps = jax.random.normal(key, mean.shape, dtype=mean.dtype)
        return mean + jnp.exp(logstd) * eps

    def decode(self, z, train: bool = False):
        return self.decoder(self.latent_up(z), train)

    def __call__(self, x, key, train: bool = False):
        mean, logstd = self.encode(x, train)
        z = self.reparameterize(key, mean, logstd)
        recon = self.decode(z, train)
        return recon, mean, logstd

    def sample(self, key, n: int, train: bool = False):
        """Draw n maps from the prior z ~ N(0, I) (vae.py:288-310)."""
        z = jax.random.normal(key, (n, self.latent_dim))
        return self.decode(z, train)

    def reconstruct(self, x, train: bool = False):
        """Posterior-mean reconstruction (vae.py:312-343)."""
        mean, _ = self.encode(x, train)
        return self.decode(mean, train)

    def loss(self, recon, target, mean, logstd):
        """BCE data term (vae.py:345-370) + exp-stabilized KL
        0.5 * sum(mean^2 + exp(2 logstd) - 2 logstd - 1)  (vae.py:372-394),
        scaled by beta."""
        eps = 1e-7
        r = jnp.clip(recon, eps, 1.0 - eps)
        bce = -jnp.sum(target * jnp.log(r) + (1 - target) * jnp.log(1 - r))
        kl = 0.5 * jnp.sum(
            jnp.square(mean) + jnp.exp(2.0 * logstd) - 2.0 * logstd - 1.0)
        b = recon.shape[0]
        return (bce + self.beta * kl) / b, bce / b, kl / b


def betaVAE(latent_dim: int = 64, beta: float = 4.0) -> VAE:
    return VAE(latent_dim=latent_dim, beta=beta)
