"""Deep-image-prior decoder (untrained prior).

Re-design of `deep_prior/networks/dip.py:20-89` `DecoderDip`: five
Upsample(x2) + double-Conv + BatchNorm + SELU blocks from z=256 at 1x1 to
52x52, final Conv(k4, p1) to 51x51 with sigmoid.  NHWC.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from quantized_spectrum_cartography_tpu.models.layers import (
    conv_torch,
    upsample2x,
)

# (features, first_kernel, first_pad) per upsample block; second conv is
# always k3 p1.  Shape walk: 1->2->3 | 3->6->6 | 6->12->12 | 12->24->26 |
# 26->52->52  (dip.py:26-80).
_BLOCKS = (
    (128, 2, 1),
    (64, 3, 1),
    (32, 3, 1),
    (16, 3, 2),
    (2, 3, 1),
)


class DecoderDip(nn.Module):
    z_dim: int = 256

    @nn.compact
    def __call__(self, z: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = z.reshape(z.shape[0], 1, 1, self.z_dim)
        for f, k1, p1 in _BLOCKS:
            x = upsample2x(x)
            x = conv_torch(f, k1, 1, p1)(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, epsilon=1e-5)(x)
            x = nn.selu(x)
            x = conv_torch(f, 3, 1, 1)(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, epsilon=1e-5)(x)
            x = nn.selu(x)
        x = conv_torch(1, 4, 1, 1)(x)     # 52 -> 51
        return nn.sigmoid(x)
