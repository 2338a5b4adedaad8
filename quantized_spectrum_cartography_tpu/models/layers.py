"""Shared NN building blocks (NHWC / TPU-native layouts).

The reference duplicates Flatten/UnFlatten/TVLoss across every model file
(`deep_prior/networks/gan.py:8-31`, `ae.py:15-25`, `dip.py:8-18`); here
they live once.  Torch layer semantics are mapped to flax:
ConvTranspose2d(k, s, p)  ==  nn.ConvTranspose(padding=(k-1-p, k-1-p)).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def convt_torch(features: int, kernel: int, stride: int, pad: int, name=None):
    """flax ConvTranspose matching torch ConvTranspose2d(k, s, p):
    out = (in-1)*s - 2p + k."""
    a = kernel - 1 - pad
    return nn.ConvTranspose(
        features, (kernel, kernel), strides=(stride, stride),
        padding=[(a, a), (a, a)], name=name)


def conv_torch(features: int, kernel: int, stride: int, pad: int,
               use_bias: bool = True, name=None):
    """flax Conv matching torch Conv2d(k, s, p): out = floor((in+2p-k)/s)+1."""
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)], use_bias=use_bias, name=name)


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample (torch nn.Upsample(scale_factor=2))."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")


def total_variation_loss(img: jnp.ndarray) -> jnp.ndarray:
    """TV loss (reference `TVLoss`, gan.py:20-31), img in NHWC."""
    b, h, w, c = img.shape
    tv_h = jnp.sum(jnp.square(img[:, 1:, :, :] - img[:, :-1, :, :]))
    tv_w = jnp.sum(jnp.square(img[:, :, 1:, :] - img[:, :, :-1, :]))
    return (tv_h + tv_w) / (b * h * w * c)


class BatchNorm(nn.Module):
    """BatchNorm2d equivalent; `train` toggles batch vs running stats."""

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
