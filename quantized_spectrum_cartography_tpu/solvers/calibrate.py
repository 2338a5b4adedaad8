"""Post-solve amplitude recalibration.

The reference's lambda_c = lambda_s = 100 Frobenius penalties (qmc.ipynb
cell 1) shrink the recovered factors along the quantized likelihood's
flat directions — measured C norms ~0.24 vs ground truth 1.0 at the
headline config, which dominates the linear-domain NMSE.  Because the
likelihood is invariant-ish but not flat in a *global gain*, the scalar

    gamma* = argmin_gamma  nll( log(gamma * T_hat + offset) )

is well identified; we recover it by a dense log-spaced grid evaluation
(one fused pass over candidates, jit-friendly) plus a golden-ratio
refinement.  This is an addition over the reference (which ships no
amplitude correction).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from quantized_spectrum_cartography_tpu.ops.likelihood import (
    gather_bin_bounds,
    log_prob_probit_bounds,
    masked_nll,
)


def recalibrate_gain(
    T_hat: jnp.ndarray,
    Y: jnp.ndarray,
    bin_boundaries: jnp.ndarray,
    sigma: float,
    offset: float,
    mask: Optional[jnp.ndarray] = None,
    num_grid: int = 64,
    gamma_lo: float = 1e-2,
    gamma_hi: float = 1e2,
    refine_iters: int = 20,
):
    """Returns (gamma_star, T_hat * gamma_star)."""
    bb = jnp.asarray(bin_boundaries, jnp.float32)
    W, U = gather_bin_bounds(Y, bb)

    def nll_of_gamma(g):
        x = jnp.log(g * T_hat + offset)
        return masked_nll(log_prob_probit_bounds(W, U, x, sigma), mask)

    log_g = jnp.linspace(jnp.log(gamma_lo), jnp.log(gamma_hi), num_grid)
    vals = jax.vmap(lambda lg: nll_of_gamma(jnp.exp(lg)))(log_g)
    i = jnp.argmin(vals)
    lo = log_g[jnp.maximum(i - 1, 0)]
    hi = log_g[jnp.minimum(i + 1, num_grid - 1)]

    # golden-section refinement on log-gamma
    gr = 0.6180339887498949

    def body(_, carry):
        lo, hi = carry
        m1 = hi - gr * (hi - lo)
        m2 = lo + gr * (hi - lo)
        f1 = nll_of_gamma(jnp.exp(m1))
        f2 = nll_of_gamma(jnp.exp(m2))
        lo = jnp.where(f1 < f2, lo, m1)
        hi = jnp.where(f1 < f2, m2, hi)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, refine_iters, body, (lo, hi))
    gamma = jnp.exp(0.5 * (lo + hi))
    return gamma, gamma * T_hat
