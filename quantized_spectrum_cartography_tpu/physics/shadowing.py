"""Spatially correlated log-normal shadow fading.

Re-design of `qmc/Shadowing_data.m:1-26`: correlation
E[z(x)z(x')] = var^2 * p^{|x-x'|} with p = exp(-1/Xc).  The reference
builds the dense 2601x2601 distance matrix and Cholesky factor *per call*;
here the factor depends only on (grid, Xc) so it is computed once in
float64 on the host, cached, and reused — sampling then is a single
(IJ x IJ) @ (IJ x B) matmul on the MXU, vmappable over a batch of maps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def grid_coords(grid_size: int, resolution: float = 1.0) -> np.ndarray:
    """Complex grid coordinates, column-major vectorized like MATLAB
    Xgrid(:) (generate_map.m:96-101: meshgrid then linear indexing)."""
    pts = np.arange(grid_size) * resolution
    Xm, Ym = np.meshgrid(pts, pts)          # MATLAB meshgrid(x,y)
    Z = Xm + 1j * Ym
    return Z.reshape(-1, order="F")          # MATLAB column-major (:)


@functools.lru_cache(maxsize=8)
def correlation_cholesky(grid_size: int, Xc: float) -> np.ndarray:
    """Lower Cholesky factor of R(d) = p^d over all grid-point pairs.

    float64 on host for numerical robustness (the exponential kernel is
    ill-conditioned; f32 Cholesky can fail), cast to f32 for device use.
    Reference: Shadowing_data.m:18-21.
    """
    z = grid_coords(grid_size)
    d = np.abs(z[:, None] - z[None, :])
    p = np.exp(-1.0 / Xc)
    R = p ** d
    L = np.linalg.cholesky(R)
    return L.astype(np.float32)


def sample_shadowing(
    key: jax.Array,
    chol: jnp.ndarray,
    grid_size: int,
    sigma: float,
) -> jnp.ndarray:
    """One correlated shadowing field [I, J] in dB.

    shadow = unvec(L @ (sigma * iid_normal))  (Shadowing_data.m:17-23).
    The unvec must match MATLAB's column-major reshape.
    """
    n = grid_size * grid_size
    iid = sigma * jax.random.normal(key, (n,), dtype=jnp.float32)
    vec = chol @ iid
    # MATLAB reshape(v, [m n]) is column-major -> transpose of C-order
    return vec.reshape(grid_size, grid_size).T
