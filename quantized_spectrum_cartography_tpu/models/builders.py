"""Architecture-dict-driven network builders.

Re-design of `deep_prior/networks/model_utils.py:10-260` (create_encoder /
create_decoder / create_discriminator / create_output_layer and the conv
shape arithmetic, duplicated verbatim at networks/utils/model_utils.py):
a dict like

    {"conv_layers": 5,
     "conv_channels": [16, 32, 64, 128, 256],
     "conv_kernel_sizes": [(4,4)]*5,
     "conv_strides": [(2,2), ...],
     "conv_paddings": [(1,1), ...],
     "z_dimension": 64}

builds the conv stack, tracking output shapes and validating the walk like
the reference's InvalidArchitectureError (networks/utils/errors.py).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import flax.linen as nn
import jax.numpy as jnp


class InvalidArchitectureError(ValueError):
    """Shape walk hit a non-positive spatial size (utils/errors.py:1-20)."""


def conv_output_shape(hw: Tuple[int, int], kernel, stride, pad):
    """torch Conv2d arithmetic: floor((in + 2p - k)/s) + 1
    (model_utils.py conv shape helpers)."""
    h = (hw[0] + 2 * pad[0] - kernel[0]) // stride[0] + 1
    w = (hw[1] + 2 * pad[1] - kernel[1]) // stride[1] + 1
    return h, w


def trace_encoder_shapes(arch: Dict, input_hw=(51, 51)) -> List[Tuple[int, int]]:
    shapes = []
    hw = input_hw
    for i in range(arch["conv_layers"]):
        hw = conv_output_shape(hw, arch["conv_kernel_sizes"][i],
                               arch["conv_strides"][i],
                               arch["conv_paddings"][i])
        if hw[0] <= 0 or hw[1] <= 0:
            raise InvalidArchitectureError(
                f"layer {i} collapses spatial dims to {hw}")
        shapes.append(hw)
    return shapes


class DictEncoder(nn.Module):
    """Conv stack from an architecture dict -> z vector (create_encoder +
    GANEncoder, gan.py:227-246)."""

    arch: Dict
    input_hw: Tuple[int, int] = (51, 51)
    negative_slope: float = 0.15    # LeakyReLU(0.15), model_utils.py:118

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        shapes = trace_encoder_shapes(self.arch, self.input_hw)
        a = self.arch
        for i in range(a["conv_layers"]):
            k = a["conv_kernel_sizes"][i]
            s = a["conv_strides"][i]
            p = a["conv_paddings"][i]
            x = nn.Conv(a["conv_channels"][i], k, strides=s,
                        padding=[(p[0], p[0]), (p[1], p[1])])(x)
            x = nn.leaky_relu(x, self.negative_slope)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, epsilon=1e-5)(x)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(a["z_dimension"])(x)


class DictDiscriminator(nn.Module):
    """z -> 1 MLP with halving widths (create_discriminator,
    model_utils.py:196-230)."""

    z_dimension: int
    num_layers: int = 3

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        w = self.z_dimension
        x = z
        for _ in range(self.num_layers):
            w = max(w // 2, 1)
            x = nn.leaky_relu(nn.Dense(w)(x), 0.15)
        return nn.sigmoid(nn.Dense(1)(x))


def GANEncoder() -> DictEncoder:
    """The reference GANEncoder architecture (gan.py:227-246)."""
    return DictEncoder(arch={
        "conv_layers": 5,
        "conv_channels": [16, 32, 64, 128, 256],
        "conv_kernel_sizes": [(4, 4)] * 5,
        "conv_strides": [(1, 1), (2, 2), (1, 1), (2, 2), (2, 2)],
        "conv_paddings": [(1, 1)] * 5,
        "z_dimension": 64,
    })
