"""Rank-R outer-product reconstruction and factor projections.

The reference builds T = sum_r S_r o c_r with nested Python loops over R and
K (`qmc/quantization_model.py:70-86` — its #1 hot loop, duplicated five
times across the repo).  On TPU this is a single einsum that XLA maps onto
the MXU; batched over maps it becomes one batched matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# Rank-R contractions run at HIGHEST precision: on TPU the default matmul
# precision feeds the MXU bf16 inputs, whose ~0.4% relative error is visible
# in the recovery NMSE; these contractions are tiny (R ~ 2-10) and
# bandwidth-bound, so full f32 costs nothing.
_HIGH = jax.lax.Precision.HIGHEST


def outer(mat: jnp.ndarray, vec: jnp.ndarray) -> jnp.ndarray:
    """vec[k] * mat[i,j] -> [K, I, J] (reference `quantization_model.py:70-77`)."""
    return jnp.einsum("ij,k->kij", mat, vec, precision=_HIGH)


def get_tensor(S: jnp.ndarray, C: jnp.ndarray) -> jnp.ndarray:
    """T[k,i,j] = sum_r S[r,i,j] * C[r,k].

    Reference `get_tensor` (`quantization_model.py:79-86`) with S of shape
    [R, 1, I, J] or [R, I, J] and C of shape [R, K]; returns [K, I, J].
    Batched (leading map axes) inputs are handled by the same einsum.
    """
    if S.ndim == 4:  # [R, 1, I, J] torch-channel layout
        S = S[:, 0]
    return jnp.einsum("rij,rk->kij", S, C, precision=_HIGH)


def get_tensor_flat(S_flat: jnp.ndarray, C: jnp.ndarray) -> jnp.ndarray:
    """Flattened-spatial reconstruction: [R, IJ] x [R, K] -> [K, IJ].

    This is the layout the Pallas fused kernel uses: spatial dims collapsed
    to one lane-aligned axis so the contraction is a plain (K,R)@(R,IJ)
    matmul on the MXU.
    """
    return jnp.einsum("rp,rk->kp", S_flat, C, precision=_HIGH)


def safe_fro(x: jnp.ndarray) -> jnp.ndarray:
    """Frobenius norm with a well-defined (zero) gradient at the origin.

    Solvers start factors at zero (qmc.ipynb cell 1 'zero start'); the exact
    norm's gradient x/||x|| is 0/0 there and poisons the whole first Adam
    update with NaNs.
    """
    return jnp.sqrt(jnp.sum(jnp.square(x)) + 1e-24)


def project_nonneg(x: jnp.ndarray) -> jnp.ndarray:
    """Nonnegative-orthant projection (reference `C[C<0] = 0`, qmc.ipynb cell 1)."""
    return jnp.maximum(x, 0.0)


def project_rank(S: jnp.ndarray, rank: int) -> jnp.ndarray:
    """SVD rank truncation of each SLF matrix.

    Reference: `backup/notebooks/onebit_lowrank.ipynb` cell 1
    (torch.svd, zero singular values past L, recompose).  Batched over
    leading axes via jnp.linalg.svd.
    """
    u, s, vt = jnp.linalg.svd(S, full_matrices=False)
    s = s * (jnp.arange(s.shape[-1]) < rank)
    return jnp.einsum("...ik,...k,...kj->...ij", u, s, vt, precision=_HIGH)


def project_rank_subspace(
    S: jnp.ndarray,
    rank: int,
    oversample: int = 8,
    power_iters: int = 1,   # 1 round reaches ~4e-6 rel err on SLF spectra
) -> jnp.ndarray:
    """Rank truncation via randomized subspace iteration (no SVD).

    Same feasible-set projection as `project_rank` but built from batched
    skinny QRs and matmuls: Q spans the top-(rank+oversample) left singular
    subspace after `power_iters` rounds of (S Sᵀ)-multiplication with
    Householder-QR re-orthonormalization (Gram-based Cholesky/eigh
    whitening is NOT stable here — SLF spectra are too ill-conditioned for
    f32 Gram matrices); the top-`rank` directions inside the subspace come
    from a (rank+oversample)² eigendecomposition.  Measured on TPU v5e:
    8.6 ms vs 85 ms for the batched 51x51 `jnp.linalg.svd` at [256,51,51],
    agreeing with the exact SVD projection to ~4e-3 relative (the deviation
    sits in the smallest retained singular directions; solver NMSE
    trajectories are indistinguishable — tests/test_lowrank.py).
    """
    m, n = S.shape[-2], S.shape[-1]
    k = min(rank + oversample, min(m, n))
    if rank >= min(m, n):
        return S
    St = jnp.swapaxes(S, -1, -2)

    # fixed probe => deterministic inside jit/scan
    G0 = jax.random.normal(jax.random.PRNGKey(7), (n, k), S.dtype)
    Y = S @ G0
    for _ in range(power_iters):
        Q, _ = jnp.linalg.qr(Y)
        Y = S @ (St @ Q)
    Q, _ = jnp.linalg.qr(Y)                        # [..., m, k]
    B = jnp.swapaxes(Q, -1, -2) @ S                # [..., k, n]
    evals, evecs = jnp.linalg.eigh(
        B @ jnp.swapaxes(B, -1, -2))               # ascending
    Ub = evecs[..., -rank:]                        # top-rank directions
    U = Q @ Ub                                     # [..., m, rank]
    return U @ (jnp.swapaxes(U, -1, -2) @ S)


def init_factors(
    R: int, I: int, J: int, K: int, dtype=jnp.float32
):
    """Zero-start factors (qmc.ipynb cell 1 'zero start')."""
    return jnp.zeros((R, I, J), dtype), jnp.zeros((R, K), dtype)


def pad_spatial(x: jnp.ndarray, multiple: int = 128) -> jnp.ndarray:
    """Pad the trailing (flattened-spatial) axis up to a lane multiple."""
    p = (-x.shape[-1]) % multiple
    if p == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, p)]
    return jnp.pad(x, pad)
