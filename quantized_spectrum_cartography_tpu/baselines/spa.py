"""Successive Projection Algorithm (SPA) NMF initialization.

Re-design of `backup/algorithms/NMF_SPA.m:1-75`: greedy selection of R
near-pure columns (max squared norm, then orthogonal deflation), followed
by pseudo-inverse recovery of the other factor with positivity clamp and
column renormalization.  The greedy loop has a fixed trip count R so it
jits; the deflation is rank-1 and runs on the MXU.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_HIGH = jax.lax.Precision.HIGHEST


def column_sum_normalize(X: jnp.ndarray):
    """Divide each column by its sum (MATLAB ColumnSumNormalization)."""
    s = jnp.sum(X, axis=0, keepdims=True)
    safe = jnp.where(jnp.abs(s) > 0, s, 1.0)
    return X / safe, jnp.squeeze(s, 0)


def spa_indices(X: jnp.ndarray, r: int) -> jnp.ndarray:
    """Indices of r successively projected extreme columns
    (NMF_SPA.m:30-55 `SPA`)."""

    def body(carry, _):
        R_mat, _ = carry
        norms = jnp.sum(jnp.square(R_mat), axis=0)
        k = jnp.argmax(norms)
        u = R_mat[:, k] / jnp.maximum(jnp.linalg.norm(R_mat[:, k]), 1e-12)
        R_new = R_mat - jnp.outer(u, u @ R_mat)
        return (R_new, k), k

    (_, _), ks = jax.lax.scan(body, (X, jnp.int32(0)), None, length=r)
    return ks


def nmf_spa(T_km: jnp.ndarray, R: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """NMF via SPA on the mode-unfolded map T_km [K, IJ] = C^T S.

    NMF_SPA.m:3-28 transposes its input, so SPA runs over per-frequency
    spatial columns and selects R near-pure *frequency bands* (bands where
    one emitter dominates — the PSD-separability assumption of
    generate_map.m); the selected columns are the SLF estimates, and the
    PSD factor C comes from the pseudo-inverse regression, positivity
    clamp, and L2 column normalization with the scale pushed into S.
    Returns (C [R, K], S [R, IJ]).
    """
    Tm = T_km.T                                          # [IJ, K]
    Tn, normalizer = column_sum_normalize(Tm)
    idx = spa_indices(Tn, R)
    Sm = Tn[:, idx] * normalizer[idx][None, :]           # [IJ, R] spatial
    # C = pinv(Sm) @ Tm  (NMF_SPA.m:17-21)
    C = jnp.linalg.solve(
        Sm.T @ Sm + 1e-10 * jnp.eye(R), Sm.T @ Tm).T     # [K, R]
    C = jnp.maximum(C, 0.0)                              # clamp (NMF_SPA.m:23)
    # L2-normalize C columns, push norms into S (NMF_SPA.m:24-27)
    d = jnp.linalg.norm(C, axis=0)
    d_safe = jnp.maximum(d, 1e-12)
    C = C / d_safe
    Sm = Sm * d[None, :]
    return C.T, Sm.T
