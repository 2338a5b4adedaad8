"""Completion autoencoders: (mask || masked map) [B,51,51,2] -> map [B,51,51,1].

Re-design of `deep_prior/networks/ae.py:27-216` (Encoder/Decoder with
LeakyReLU+BN, EncoderSelu/DecoderSelu with SELU, Autoencoder wrappers) and
the hourglass completion nets of `deep_prior/networks/adversarial_model.py`
(EncoderDecoder family) — all collapsed into two config-driven modules.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from quantized_spectrum_cartography_tpu.models.layers import (
    conv_torch,
    convt_torch,
)

# Encoder conv stack (features, kernel, stride, pad): 51->25->12->6->3->1
_ENC_STAGES: Tuple[Tuple[int, int, int, int], ...] = (
    (16, 4, 2, 1),
    (32, 4, 2, 1),
    (64, 4, 2, 1),
    (128, 4, 2, 1),
    (256, 3, 1, 0),
)
# Decoder mirrors the Generator256 stack (ae.py DecoderSelu == gan.py
# Generator256 with SELU): 1->3->6->12->26->54 -> conv k4 -> 51
_DEC_STAGES: Tuple[Tuple[int, int, int, int], ...] = (
    (128, 3, 1, 0),
    (64, 4, 2, 1),
    (32, 4, 2, 1),
    (16, 4, 2, 0),
    (2, 4, 2, 0),
)


def _act(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    return {"selu": nn.selu,
            "leaky_relu": lambda x: nn.leaky_relu(x, 0.2),
            "relu": nn.relu}[name]


class Encoder(nn.Module):
    """Conv encoder [B,51,51,nc] -> [B, latent]  (ae.py:27-66,128-160).

    base_width scales every stage's channel count (the reference's
    EncoderDecoder512/256/128/32 width family, adversarial_model.py)."""

    activation: str = "selu"
    stages: Sequence[Tuple[int, int, int, int]] = _ENC_STAGES
    base_width: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        act = _act(self.activation)
        scale = self.base_width / 16.0
        for i, (f, k, s, p) in enumerate(self.stages):
            f = max(int(f * scale), 2)
            x = conv_torch(f, k, s, p, use_bias=False)(x)
            if i > 0:  # first conv has no BN in the reference
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5)(x)
            x = act(x)
        return x.reshape(x.shape[0], -1)


class Decoder(nn.Module):
    """Transpose-conv decoder [B, latent] -> [B,51,51,1]  (ae.py:68-125).

    `head` selects the output nonlinearity:
      'sigmoid'        — the reference head (networks/ae.py:100);
      'softplus'       — non-saturating: peak-amplitude targets are not
                         pinned by the sigmoid's comfortable range (the
                         round-3 measured ~0.71x dense-z-fit peak ceiling
                         of the sigmoid-head VAE decoder);
      'scaled_sigmoid' — sigmoid * exp(learned log-gain): bounded shape,
                         learned global amplitude.
    Non-sigmoid heads require an MSE-family data term (outputs leave
    [0, 1])."""

    activation: str = "selu"
    stages: Sequence[Tuple[int, int, int, int]] = _DEC_STAGES
    base_width: int = 16
    head: str = "sigmoid"
    refine_width: int = 0   # >0: full-resolution refinement block — the
                            # transpose-conv stack ends with only ~2-4
                            # channels at 54x54, which caps how sharp a
                            # peak the decoder can render (measured
                            # dense-z-fit peak ratio plateaus ~0.78
                            # regardless of training budget); two SAME
                            # convs at 51x51 add the missing
                            # high-frequency capacity

    @nn.compact
    def __call__(self, z: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        act = _act(self.activation)
        scale = self.base_width / 16.0
        x = z.reshape(z.shape[0], 1, 1, z.shape[-1])
        for f, k, s, p in self.stages:
            f = max(int(f * scale), 2)
            x = convt_torch(f, k, s, p)(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, epsilon=1e-5)(x)
            x = act(x)
        if self.refine_width:
            x = conv_torch(self.refine_width, 4, 1, 0)(x)   # 54 -> 51
            x = act(x)
            x = act(nn.Conv(self.refine_width, (3, 3), padding="SAME")(x))
            x = nn.Conv(1, (3, 3), padding="SAME")(x)
        else:
            x = conv_torch(1, 4, 1, 0)(x)
        if self.head == "sigmoid":
            return nn.sigmoid(x)
        if self.head == "softplus":
            return nn.softplus(x)
        if self.head == "scaled_sigmoid":
            log_gain = self.param("log_gain", nn.initializers.zeros, ())
            return nn.sigmoid(x) * jnp.exp(log_gain)
        raise ValueError(f"unknown decoder head {self.head!r}")


class Autoencoder(nn.Module):
    """Completion AE: masked-map channels in, full map out (ae.py:170-216).

    activation='selu' gives the reference's AutoencoderSelu (the '1bit_map'
    model behind deep_comp.py / nn_descent_ae.py); 'leaky_relu' the plain
    Autoencoder.  linear_bottleneck > 0 inserts a Dense bottleneck of that
    width — the reference's AutoencoderLinear
    (adversarial_model.py AutoencoderLinear, 128-d).
    """

    activation: str = "selu"
    linear_bottleneck: int = 0
    base_width: int = 16

    def setup(self):
        self.encoder = Encoder(activation=self.activation,
                               base_width=self.base_width)
        self.decoder = Decoder(activation=self.activation,
                               base_width=self.base_width)
        if self.linear_bottleneck:
            self.bottleneck_down = nn.Dense(self.linear_bottleneck)
            self.bottleneck_up = nn.Dense(256)

    def encode(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(mask || map) [B,51,51,2] -> latent code [B, latent].

        The reference's `autoencoder.encoder(test_slf)` — the latent that
        seeds the committed DowJons S-step (`nn_descent_ae.py:195-201`
        model_ae returns it; `run_descent_ae` then optimizes it)."""
        h = self.encoder(x, train)
        if self.linear_bottleneck:
            h = self.bottleneck_up(nn.relu(self.bottleneck_down(h)))
        return h

    def decode(self, h: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """latent [B, latent] -> completed map [B,51,51,1] — the
        reference's `autoencoder.decoder` (nn_descent_ae.py:293,300)."""
        return self.decoder(h, train)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.decode(self.encode(x, train), train)


def AutoencoderLinear(bottleneck: int = 128) -> Autoencoder:
    """Reference AutoencoderLinear (adversarial_model.py): hourglass with a
    128-d linear bottleneck."""
    return Autoencoder(activation="leaky_relu", linear_bottleneck=bottleneck)


def EncoderDecoder(width: int = 256) -> Autoencoder:
    """The reference's EncoderDecoder completion-net family
    (adversarial_model.py EncoderDecoder{,12,512,256,128,_128,32}): conv
    hourglass mask+map -> map, channel widths scaled by `width` (the
    bottleneck channel count; 256 matches the default stack)."""
    return Autoencoder(activation="leaky_relu", base_width=max(width // 16, 2))
