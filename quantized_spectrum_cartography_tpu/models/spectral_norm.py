"""Spectral normalization via power iteration.

Re-design of `deep_prior/networks/sngan/snlayers/snconv2d.py:101-120` and
`sngan/functions/max_sv.py:5-22`: the largest singular value of the
flattened kernel is tracked with a persistent power-iteration vector `u`
(carried in a flax variable collection, updated once per training step),
and the kernel is divided by it.  Unlike the reference there is no `.cuda()`
default — state lives wherever the params are sharded.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _l2norm(v, eps=1e-12):
    return v / (jnp.linalg.norm(v) + eps)


def power_iteration(W: jnp.ndarray, u: jnp.ndarray, steps: int = 1):
    """One (or more) rounds of power iteration on W [out, in_flat].

    Returns (sigma_max_estimate, new_u).  Reference `max_singular_value`
    (max_sv.py:5-22): v = l2norm(u W), u = l2norm(v W^T), sigma = u W v^T.
    """
    for _ in range(steps):
        v = _l2norm(u @ W)
        u = _l2norm(v @ W.T)
    sigma = jnp.sum(u @ W * v)
    return sigma, jax.lax.stop_gradient(u)


class SNConv(nn.Module):
    """Conv2d with spectrally normalized kernel (reference SNConv2d).

    torch-padding semantics like models.layers.conv_torch.
    """

    features: int
    kernel: int
    stride: int
    pad: int
    use_bias: bool = False
    power_steps: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, update_stats: bool = True) -> jnp.ndarray:
        kh = kw = self.kernel
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, in_ch, self.features))
        W = kernel.reshape(-1, self.features).T      # [out, in_flat]
        u_var = self.variable(
            "spectral_stats", "u",
            lambda: jax.random.normal(self.make_rng("params") if self.is_initializing()
                                      else jax.random.PRNGKey(0), (1, self.features)))
        sigma, new_u = power_iteration(W, u_var.value, self.power_steps)
        if (update_stats and not self.is_initializing()
                and self.is_mutable_collection("spectral_stats")):
            u_var.value = new_u
        kernel_sn = kernel / jnp.maximum(sigma, 1e-12)
        a = self.pad
        y = jax.lax.conv_general_dilated(
            x, kernel_sn,
            window_strides=(self.stride, self.stride),
            padding=[(a, a), (a, a)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y
