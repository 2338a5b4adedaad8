"""Nonnegative least squares via accelerated projected gradient.

TPU-native replacement for the DowJons C-step of the MATLAB harness,
which calls `lsqnonneg` once per frequency row in a Python-speed loop
(`backup/algorithms/joint_opt_ae.m:403-418`).  Here all rows solve
simultaneously: min_X>=0 ||A X - B||_F^2 by Nesterov-accelerated projected
gradient with the exact Lipschitz step 1/||A^T A||_2 — fixed iteration
count, fully jittable, batched over the trailing B columns.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HIGH = jax.lax.Precision.HIGHEST


def nnls(A: jnp.ndarray, B: jnp.ndarray, iters: int = 200) -> jnp.ndarray:
    """argmin_{X >= 0} ||A @ X - B||_F^2.   A: [M, R], B: [M, N] -> X: [R, N]."""
    AtA = jnp.matmul(A.T, A, precision=_HIGH)
    AtB = jnp.matmul(A.T, B, precision=_HIGH)
    return nnls_gram(AtA, AtB, iters)


def nnls_gram(AtA: jnp.ndarray, AtB: jnp.ndarray,
              iters: int = 200) -> jnp.ndarray:
    """`nnls` on precomputed normal equations: argmin_{X>=0}
    (1/2) X^T AtA X - AtB^T X per column.  AtA [R, R] (PSD), AtB [R, N]
    -> X [R, N].  Lets callers with per-problem Gram perturbations (e.g.
    the peak-constrained C polish adding rank-1 penalty terms per band)
    avoid materializing the augmented [M, R] design."""
    # Lipschitz constant of the gradient = lambda_max(AtA); power iteration
    v = jnp.ones((AtA.shape[0],), AtA.dtype)

    def pw(_, v):
        v = AtA @ v
        return v / jnp.maximum(jnp.linalg.norm(v), 1e-12)

    v = jax.lax.fori_loop(0, 30, pw, v)
    L = jnp.maximum(v @ (AtA @ v), 1e-12)
    step = 1.0 / L

    X0 = jnp.zeros_like(AtB)

    def body(carry, _):
        X, Yv, t = carry
        G = jnp.matmul(AtA, Yv, precision=_HIGH) - AtB
        X_new = jnp.maximum(Yv - step * G, 0.0)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        Yv = X_new + ((t - 1.0) / t_new) * (X_new - X)
        return (X_new, Yv, t_new), None

    (X, _, _), _ = jax.lax.scan(
        body, (X0, X0, jnp.float32(1.0)), None, length=iters)
    return X


def nnls_rows(A: jnp.ndarray, B_rows: jnp.ndarray, iters: int = 200) -> jnp.ndarray:
    """Per-row NNLS matching the harness's lsqnonneg-per-frequency loop:
    solves min_{c_k >= 0} ||A c_k - b_k|| for every row b_k of B_rows
    [K, M] against shared design A [M, R]; returns C [K, R]."""
    return nnls(A, B_rows.T, iters).T
