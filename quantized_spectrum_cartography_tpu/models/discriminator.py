"""DCGAN discriminators, plain and spectrally normalized.

Re-design of `deep_prior/networks/gan.py:248-275` (Discriminator) and
`gan.py:278-305` (SNDiscriminator): five conv stages 51->25->12->6->3->1
with LeakyReLU(0.2) (+BN after stages 2-4), sigmoid output.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from quantized_spectrum_cartography_tpu.models.layers import conv_torch
from quantized_spectrum_cartography_tpu.models.spectral_norm import SNConv

_STAGES: Tuple[Tuple[int, int, int, int], ...] = (
    (16, 4, 2, 1),    # 51 -> 25
    (32, 4, 2, 1),    # 25 -> 12
    (64, 4, 2, 1),    # 12 -> 6
    (128, 4, 2, 1),   # 6 -> 3
)


class Discriminator(nn.Module):
    spectral_norm: bool = False
    output_logits: bool = False   # raw score for hinge-loss training
                                  # (sigmoid output matches the reference's
                                  # BCE recipe, gan.py:275)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i, (f, k, s, p) in enumerate(_STAGES):
            if self.spectral_norm:
                x = SNConv(f, k, s, p, use_bias=False)(x, update_stats=train)
            else:
                x = conv_torch(f, k, s, p, use_bias=False)(x)
            if i > 0:  # first stage has no BN (gan.py:253-255)
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5)(x)
            x = nn.leaky_relu(x, 0.2)
        if self.spectral_norm:
            x = SNConv(1, 3, 1, 0, use_bias=False)(x, update_stats=train)
        else:
            x = conv_torch(1, 3, 1, 0, use_bias=False)(x)   # 3 -> 1
        x = x.reshape(x.shape[0], -1)
        return x if self.output_logits else nn.sigmoid(x)


def SNDiscriminator() -> Discriminator:
    return Discriminator(spectral_norm=True)
