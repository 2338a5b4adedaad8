"""Thin-plate-spline map completion baseline.

Replacement for the harness's `full_tps` baseline
(`backup/algorithms/joint_opt_ae.m:183`; the function itself comes from the
prior radio_map_deep_prior project, not shipped).  Classic 2-D TPS: for
each frequency band, fit  f(p) = a0 + a^T p + sum_i w_i phi(||p - p_i||),
phi(r) = r^2 log r, to the observed entries and evaluate on the full grid.
All K bands share the same sample locations, so one factorization of the
(N+3) system serves all bands (batched triangular solves on the MXU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HIGH = jax.lax.Precision.HIGHEST


def _phi(r2: jnp.ndarray) -> jnp.ndarray:
    """r^2 log r = 0.5 * r^2 log r^2, with phi(0) = 0."""
    return 0.5 * r2 * jnp.log(jnp.maximum(r2, 1e-20))


def tps_complete(
    T_obs: jnp.ndarray,
    Om: jnp.ndarray,
    sample_idx: jnp.ndarray,
    reg: float = 1e-6,
) -> jnp.ndarray:
    """Complete T [K, I, J] from per-location samples.

    sample_idx: [N, 2] integer (row, col) observed locations (static count
    N so the solve has a fixed shape); Om kept for interface parity.
    """
    K, I, J = T_obs.shape
    pts = sample_idx.astype(jnp.float32)                   # [N, 2]
    N = pts.shape[0]
    vals = T_obs[:, sample_idx[:, 0], sample_idx[:, 1]]    # [K, N]

    d2 = jnp.sum(jnp.square(pts[:, None, :] - pts[None, :, :]), -1)
    Phi = _phi(d2) + reg * jnp.eye(N)
    P = jnp.concatenate([jnp.ones((N, 1)), pts], axis=1)   # [N, 3]
    A = jnp.block([[Phi, P], [P.T, jnp.zeros((3, 3))]])    # [N+3, N+3]
    rhs = jnp.concatenate(
        [vals, jnp.zeros((K, 3))], axis=1).T               # [N+3, K]
    sol = jnp.linalg.solve(A, rhs)                         # [N+3, K]
    w, a = sol[:N], sol[N:]

    ii, jj = jnp.meshgrid(jnp.arange(I, dtype=jnp.float32),
                          jnp.arange(J, dtype=jnp.float32), indexing="ij")
    grid = jnp.stack([ii.reshape(-1), jj.reshape(-1)], axis=1)  # [IJ, 2]
    g2 = jnp.sum(jnp.square(grid[:, None, :] - pts[None, :, :]), -1)
    basis = _phi(g2)                                       # [IJ, N]
    Pg = jnp.concatenate([jnp.ones((I * J, 1)), grid], axis=1)
    full = (jnp.matmul(basis, w, precision=_HIGH)
            + jnp.matmul(Pg, a, precision=_HIGH))          # [IJ, K]
    return full.T.reshape(K, I, J)
