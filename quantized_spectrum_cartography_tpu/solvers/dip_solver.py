"""Deep-image-prior recovery: optimize untrained decoder weights per map.

The reference's DIP driver is lost (`qmc/dip.py` is empty, `qmc/dip.ipynb`
stripped — .MISSING_LARGE_BLOBS:5); only the `DecoderDip` architecture
survives (deep_prior/networks/dip.py:20-89).  This solver implements the
standard DIP protocol on that architecture: fixed random z, Adam on the
decoder parameters against the observed (masked, possibly 1-bit) data.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from quantized_spectrum_cartography_tpu.models.dip import DecoderDip
from quantized_spectrum_cartography_tpu.ops.likelihood import neg_likelihood_1bit
from quantized_spectrum_cartography_tpu.ops.metrics import nmse as nmse_metric


def recover_dip(
    key: jax.Array,
    y_obs: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    mean: float = 0.0,
    std: Optional[float] = None,
    onebit: bool = True,
    steps: int = 1000,
    lr: float = 0.001,
    z_dim: int = 256,
    slf_true: Optional[jnp.ndarray] = None,
):
    """Recover one SLF [I, J] from observations y_obs.

    onebit=True: y_obs in {0,1}, probit BCE likelihood (std required);
    onebit=False: masked MSE completion.
    Returns (S_hat [I, J], losses [steps], nmses [steps]).
    """
    model = DecoderDip(z_dim=z_dim)
    kz, kp = jax.random.split(key)
    z = jax.random.normal(kz, (1, z_dim))
    variables = model.init(kp, z, train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]

    track = slf_true is not None
    S_ref = slf_true if track else jnp.zeros(y_obs.shape, jnp.float32)

    def forward(params, batch_stats):
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats}, z, train=True,
            mutable=["batch_stats"])
        return out[0, :, :, 0], mut["batch_stats"]

    def loss_fn(params, batch_stats):
        S, bs = forward(params, batch_stats)
        if onebit:
            l = neg_likelihood_1bit(S, y_obs, mean, std, probit=True, mask=mask)
        else:
            m = jnp.ones_like(y_obs) if mask is None else mask
            l = jnp.sum(m * jnp.square(S - y_obs)) / jnp.maximum(jnp.sum(m), 1.0)
        return l, bs

    opt = optax.adam(lr)

    def step(carry, _):
        params, bs, s = carry
        (loss, bs), g = jax.value_and_grad(loss_fn, has_aux=True)(params, bs)
        u, s = opt.update(g, s, params)
        params = optax.apply_updates(params, u)
        err = (nmse_metric(forward(params, bs)[0], S_ref) if track
               else jnp.float32(0.0))
        return (params, bs, s), (loss, err)

    (params, batch_stats, _), (losses, nmses) = jax.lax.scan(
        step, (params, batch_stats, opt.init(params)), None, length=steps)
    S_hat, _ = forward(params, batch_stats)
    return S_hat, losses, nmses
