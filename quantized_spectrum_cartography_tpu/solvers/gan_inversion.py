"""Single-map GAN inversion: latent init + 1-bit recovery of one SLF.

Re-designs of:
- `qmc/qmc_utils.py:35-81`  init_z  — 200 global + 200 local random draws
  scored by MSE to a target SLF, then 100 Adam steps on z;
- `backup/notebooks/one_bit_gan.ipynb` cell 6  run_descent — 400 global +
  200 local draws scored by BCE(sigmoid(G(z)-mean), y01) or the Balevi
  correlation loss -lambda * sum(y_pm1 * (G(z)-mean)), then Adam on z.

Sequential candidate loops become one vmapped batch + argmin
(solvers/priors.randomized_search); the descent is a lax.scan.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from quantized_spectrum_cartography_tpu.ops.likelihood import neg_likelihood_1bit
from quantized_spectrum_cartography_tpu.solvers.priors import randomized_search


def _adam_descent(loss_fn, z0, lr, steps):
    opt = optax.adam(lr)

    def step(carry, _):
        z, s = carry
        loss, g = jax.value_and_grad(loss_fn)(z)
        u, s = opt.update(g, s, z)
        return (optax.apply_updates(z, u), s), loss

    (z, _), losses = jax.lax.scan(step, (z0, opt.init(z0)), None, length=steps)
    return z, losses


def init_z(
    key: jax.Array,
    gen_apply: Callable[[jnp.ndarray], jnp.ndarray],
    slf_target: jnp.ndarray,
    z_dim: int = 256,
    num_global: int = 200,
    num_local: int = 200,
    adam_steps: int = 100,
    lr: float = 0.01,
) -> jnp.ndarray:
    """Latent init against a known SLF target [I, J] (qmc_utils.py:35-81)."""
    k0, ks = jax.random.split(key)
    z0 = jax.random.normal(k0, (1, z_dim))

    def mse(S):  # S: [1, I, J]
        return jnp.mean(jnp.square(S[0] - slf_target))

    z = randomized_search(ks, gen_apply, mse, z0, num_global, num_local)
    z, _ = _adam_descent(lambda zz: mse(gen_apply(zz)), z, lr, adam_steps)
    return z


def run_onebit_inversion(
    key: jax.Array,
    gen_apply: Callable[[jnp.ndarray], jnp.ndarray],
    y_quant: jnp.ndarray,
    mean: float,
    loss_criterion: str = "bce",
    std: Optional[float] = None,
    z_dim: int = 256,
    num_global: int = 400,
    num_local: int = 200,
    adam_steps: int = 100,
    lr: float = 0.01,
    balevi_lambda: float = 0.5,
    mask: Optional[jnp.ndarray] = None,
):
    """Recover one SLF [I, J] from 1-bit observations.

    loss_criterion:
      'bce'     — BCE(sigmoid(G(z)-mean), y01), y_quant in {0,1}
                  (one_bit_gan.ipynb cell 6, sigmoid link)
      'probit'  — probit-link BCE with noise std (cell 11 family)
      'balevi'  — -lambda * sum(y_pm1 * (G(z)-mean)), y_quant in {-1,+1}
      'balevi-nuc' — Balevi correlation + nuclear norm of the map
                  (onebit.ipynb cell 2 `BaleviLoss`: sum of singular values
                  as a convex low-rank surrogate)

    Returns (S_hat [I, J], z, losses).
    """
    if loss_criterion in ("balevi", "balevi-nuc"):
        nuc = loss_criterion == "balevi-nuc"

        def loss_of_map(S):
            r = S - mean
            if mask is not None:
                r = r * mask
            cost = -balevi_lambda * jnp.sum(y_quant * r)
            if nuc:
                cost = cost + jnp.sum(
                    jnp.linalg.svd(S, compute_uv=False))
            return cost
    elif loss_criterion in ("bce", "probit"):
        probit = loss_criterion == "probit"

        def loss_of_map(S):
            return neg_likelihood_1bit(
                S, y_quant, mean, std=std, probit=probit, mask=mask)
    else:
        raise ValueError(loss_criterion)

    k0, ks = jax.random.split(key)
    z0 = jax.random.normal(k0, (1, z_dim))
    z = randomized_search(
        ks, gen_apply, lambda S: loss_of_map(S[0]), z0, num_global, num_local)
    z, losses = _adam_descent(
        lambda zz: loss_of_map(gen_apply(zz)[0]), z, lr, adam_steps)
    return gen_apply(z)[0], z, losses
