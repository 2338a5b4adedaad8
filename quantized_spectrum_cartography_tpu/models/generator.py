"""DCGAN-style SLF generators (the deep prior G: z -> 1x51x51 map).

TPU-native (NHWC, flax.linen) re-designs of the reference architectures in
`deep_prior/networks/gan.py`:

- Generator256  (gan.py:83-126)  — the production prior behind qmc.ipynb
- Generator512  (gan.py:33-81)
- Generator128  (gan.py:129-172)
- Generator     (gan.py:175-224) — z=64 with a Linear(64->128) stem

Each stage is ConvTranspose -> BatchNorm -> ReLU with the torch shape walk
1 -> 3 -> 6 -> 12 -> 26 -> 54 -> (final Conv k4 VALID) 51, sigmoid output.
Weight-level checkpoint parity is not required (reference checkpoints are
stripped, `.MISSING_LARGE_BLOBS`); architecture and scale match.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from quantized_spectrum_cartography_tpu.models.layers import (
    conv_torch,
    convt_torch,
)

# (features, kernel, stride, torch_pad) per upsampling stage
_STAGES_256: Tuple[Tuple[int, int, int, int], ...] = (
    (128, 3, 1, 0),   # 1 -> 3
    (64, 4, 2, 1),    # 3 -> 6
    (32, 4, 2, 1),    # 6 -> 12
    (16, 4, 2, 0),    # 12 -> 26
    (2, 4, 2, 0),     # 26 -> 54
)
_STAGES_512: Tuple[Tuple[int, int, int, int], ...] = (
    (256, 3, 1, 0),   # 1 -> 3
    (128, 3, 1, 0),   # 3 -> 5
    (64, 4, 1, 1),    # 5 -> 6
    (32, 4, 2, 1),    # 6 -> 12
    (16, 4, 2, 0),    # 12 -> 26
    (2, 4, 2, 0),     # 26 -> 54
)
_STAGES_128: Tuple[Tuple[int, int, int, int], ...] = (
    (128, 3, 1, 0),
    (64, 4, 2, 1),
    (32, 4, 2, 1),
    (16, 4, 2, 0),
    (2, 4, 2, 0),
)


class DCGANGenerator(nn.Module):
    """Config-driven transpose-conv decoder z -> [B, 51, 51, 1]."""

    z_dim: int = 256
    stages: Sequence[Tuple[int, int, int, int]] = _STAGES_256
    linear_stem: int = 0          # Generator(z=64) uses Linear(64->128)

    @nn.compact
    def __call__(self, z: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = z
        if self.linear_stem:
            x = nn.relu(nn.Dense(self.linear_stem)(x))
        x = x.reshape(x.shape[0], 1, 1, x.shape[-1])
        for f, k, s, p in self.stages:
            x = convt_torch(f, k, s, p)(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, epsilon=1e-5)(x)
            x = nn.relu(x)
        x = conv_torch(1, 4, 1, 0)(x)     # 54 -> 51
        return nn.sigmoid(x)


def Generator256() -> DCGANGenerator:
    return DCGANGenerator(z_dim=256, stages=_STAGES_256)


def Generator512() -> DCGANGenerator:
    return DCGANGenerator(z_dim=512, stages=_STAGES_512)


def Generator128() -> DCGANGenerator:
    return DCGANGenerator(z_dim=128, stages=_STAGES_128)


def Generator64() -> DCGANGenerator:
    """Reference `Generator` (z=64, Linear stem to 128; gan.py:175-224)."""
    return DCGANGenerator(z_dim=64, stages=_STAGES_128, linear_stem=128)


def make_generator(z_dim: int) -> DCGANGenerator:
    return {64: Generator64, 128: Generator128,
            256: Generator256, 512: Generator512}[z_dim]()
