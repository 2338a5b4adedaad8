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
    linear: bool = False,
):
    """Returns (gamma_star, T_hat * gamma_star).  `linear=True` scores the
    gain against a linear-domain quantizer (x = gamma*T_hat, e.g. the
    256-bin uniform table, qmc/utils.py:17-27) instead of the log link."""
    bb = jnp.asarray(bin_boundaries, jnp.float32)
    W, U = gather_bin_bounds(Y, bb)

    def nll_of_gamma(g):
        x = (g * T_hat if linear
             else jnp.log(g * T_hat + offset))
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


def recalibrate_gains_per_emitter(
    S: jnp.ndarray,
    C: jnp.ndarray,
    Y: jnp.ndarray,
    bin_boundaries: jnp.ndarray,
    sigma: float,
    offset: float,
    mask: Optional[jnp.ndarray] = None,
    steps: int = 150,
    lr: float = 0.05,
):
    """Per-emitter gain refit: gamma* = argmin_{g in R^R} nll(log(sum_r
    e^{g_r} S_r o c_r + offset)) by Adam on log-gains, seeded from the
    global-gain optimum.  Strictly more expressive than the scalar
    `recalibrate_gain` (a single lambda_c=lambda_s=100 shrinkage does not
    hit every emitter equally — round-1 RESULTS.md lambda diagnosis);
    returns (gains [R], T_cal [K, I, J]).
    """
    import optax

    from quantized_spectrum_cartography_tpu.ops.lowrank import get_tensor

    bb = jnp.asarray(bin_boundaries, jnp.float32)
    W, U = gather_bin_bounds(Y, bb)
    T0 = get_tensor(S, C)
    g0, _ = recalibrate_gain(T0, Y, bb, sigma, offset, mask)
    R = S.shape[0]

    def nll_of(logg):
        T = get_tensor(S * jnp.exp(logg)[:, None, None], C)
        x = jnp.log(jnp.maximum(T, 0.0) + offset)
        return masked_nll(log_prob_probit_bounds(W, U, x, sigma), mask)

    opt = optax.adam(lr)

    def step(carry, _):
        logg, st = carry
        loss, grad = jax.value_and_grad(nll_of)(logg)
        up, st = opt.update(grad, st, logg)
        return (optax.apply_updates(logg, up), st), loss

    logg0 = jnp.full((R,), jnp.log(g0), jnp.float32)
    (logg, _), losses = jax.lax.scan(step, (logg0, opt.init(logg0)), None,
                                     length=steps)
    # keep whichever of {refined, global-seed} has lower NLL (Adam on a
    # 2-parameter landscape can overshoot at fixed lr)
    better = nll_of(logg) < nll_of(logg0)
    logg = jnp.where(better, logg, logg0)
    gains = jnp.exp(logg)
    return gains, get_tensor(S * gains[:, None, None], C)
