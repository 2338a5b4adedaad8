"""Block-term (LL1) tensor decomposition baseline.

The MATLAB harness benchmarks an `BTD(T, ...)` rank-(L,L,1) decomposition
(`backup/algorithms/joint_opt_ae.m:288`, via tensorlab — not shipped).
Model: T[i,j,k] = sum_r (A_r B_r^T)[i,j] * c[k,r] with A_r [I, L],
B_r [J, L] — each emitter's SLF is a rank-L matrix, PSDs are rank-1 in
frequency.  Solved by masked alternating least squares, each update a
batched normal-equation solve on the MXU, the whole loop one lax.scan.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_HIGH = jax.lax.Precision.HIGHEST


def _ridge_solve(G: jnp.ndarray, rhs: jnp.ndarray, reg: float) -> jnp.ndarray:
    """Relative ridge: under sparse masks some rows see few/no observed
    entries, making G singular in f32 — regularize proportionally to the
    mean diagonal (absolute floor for all-zero rows)."""
    n = G.shape[-1]
    scale = jnp.trace(G) / n
    lam = reg * jnp.maximum(scale, 1.0e-12) + 1e-20
    return jnp.linalg.solve(G + lam * jnp.eye(n, dtype=G.dtype), rhs)


def btd_ll1(
    T: jnp.ndarray,
    R: int,
    L: int = 5,
    iters: int = 50,
    mask: Optional[jnp.ndarray] = None,
    reg: float = 1e-3,
    key: Optional[jax.Array] = None,
    restarts: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Rank-(L,L,1) BTD of T [K, I, J]; returns (S [R,I,J], C [R,K], T_hat).

    mask (optional, [K, I, J] in {0,1}) selects observed entries; ALS then
    fits W*T (masked completion, the harness's usage at 5-10%% sampling).
    ALS is sensitive to init (local minima); restarts > 1 runs vmapped
    restarts and keeps the lowest-residual fit.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    if restarts > 1:
        keys = jax.random.split(key, restarts)
        S_all, C_all, T_all = jax.vmap(
            lambda k: btd_ll1(T, R, L, iters, mask, reg, k, 1))(keys)
        W = jnp.ones_like(T) if mask is None else mask
        errs = jax.vmap(
            lambda Th: jnp.sum(W * jnp.square(Th - T)))(T_all)
        best = jnp.argmin(errs)
        return S_all[best], C_all[best], T_all[best]

    K, I, J = T.shape
    ka, kb, kc = jax.random.split(key, 3)
    A = jax.random.normal(ka, (R, I, L)) * 0.1     # [R, I, L]
    Bm = jax.random.normal(kb, (R, J, L)) * 0.1    # [R, J, L]
    C = jnp.abs(jax.random.normal(kc, (R, K))) * 0.1
    W = jnp.ones_like(T) if mask is None else mask

    WT = W * T

    def slf(A, Bm):
        return jnp.einsum("ril,rjl->rij", A, Bm, precision=_HIGH)

    def step(carry, _):
        A, Bm, C = carry

        # --- C update: per (r,k), least squares on masked entries.
        S = slf(A, Bm)                                  # [R, I, J]
        # normal equations: G[r,r'] per k with mask
        G = jnp.einsum("rij,pij,kij->krp", S, S, W, precision=_HIGH)
        rhs = jnp.einsum("rij,kij->kr", S, WT, precision=_HIGH)
        C_new = jax.vmap(lambda Gk, rk: _ridge_solve(Gk, rk, reg))(G, rhs)
        C = jnp.maximum(C_new.T, 0.0)                   # [R, K]

        # --- A update: rows of A solve (R*L) systems per i.
        # design for entry (i,j,k): D[(r,l)] = B[r,j,l] * C[r,k]
        # G_i[(rl),(r'l')] = sum_{j,k} W[k,i,j] D D'
        WkC = jnp.einsum("kij,rk,pk->ijrp", W, C, C, precision=_HIGH)
        GB = jnp.einsum("rjl,pjm,ijrp->irlpm", Bm, Bm, WkC,
                        precision=_HIGH)               # [I, R, L, R, L]
        G_i = GB.reshape(I, R * L, R * L)
        rhs_i = jnp.einsum("kij,rk,rjl->irl", WT, C, Bm,
                           precision=_HIGH).reshape(I, R * L)
        A_new = jax.vmap(lambda G, r: _ridge_solve(G, r, reg))(G_i, rhs_i)
        A = A_new.reshape(I, R, L).transpose(1, 0, 2)

        # --- B update: symmetric.
        WkC2 = jnp.einsum("kij,rk,pk->ijrp", W, C, C, precision=_HIGH)
        GA = jnp.einsum("ril,pim,ijrp->jrlpm", A, A, WkC2,
                        precision=_HIGH)
        G_j = GA.reshape(J, R * L, R * L)
        rhs_j = jnp.einsum("kij,rk,ril->jrl", WT, C, A,
                           precision=_HIGH).reshape(J, R * L)
        B_new = jax.vmap(lambda G, r: _ridge_solve(G, r, reg))(G_j, rhs_j)
        Bm = B_new.reshape(J, R, L).transpose(1, 0, 2)

        T_hat = jnp.einsum("rij,rk->kij", slf(A, Bm), C, precision=_HIGH)
        err = jnp.sum(W * jnp.square(T_hat - T))
        return (A, Bm, C), err

    (A, Bm, C), errs = jax.lax.scan(step, (A, Bm, C), None, length=iters)
    S = slf(A, Bm)
    T_hat = jnp.einsum("rij,rk->kij", S, C, precision=_HIGH)
    return S, C, T_hat
