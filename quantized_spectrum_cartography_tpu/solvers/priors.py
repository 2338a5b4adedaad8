"""Generator wrappers + randomized latent search shared by GAN solvers.

The reference's randomized Z initialization (qmc.ipynb cell 1 i==1 branch,
qmc_utils.py:35-81 init_z, one_bit_gan.ipynb cell 6 run_descent) is a
sequential Python loop of single generator forwards with a running argmin;
here it is one vmapped batched forward + argmin, fixed-shape and jittable.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def make_generator_apply(module, variables) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Pure fn Z [N, z_dim] -> S [N, I, J] from a flax generator module
    (inference mode, frozen batch stats — the reference also freezes the
    GAN with .eval(), qmc_utils.py:32)."""

    def apply(Z):
        out = module.apply(variables, Z, train=False)
        return out[..., 0]

    return apply


def randomized_search(
    key: jax.Array,
    gen_apply: Callable[[jnp.ndarray], jnp.ndarray],
    criterion: Callable[[jnp.ndarray], jnp.ndarray],
    Z0: jnp.ndarray,
    num_global: int,
    num_local: int,
    local_scale: float = 0.2,
    chunk: int = 32,
) -> jnp.ndarray:
    """Two-phase randomized latent search.

    Phase 1: num_global draws Z ~ N(0, I); phase 2: num_local draws
    Z ~ best + local_scale * N(0, I).  criterion maps S=[R,I,J] (the
    generator output for one candidate) to a scalar cost; the candidate
    axis is evaluated in vmapped chunks to bound memory.  Returns the
    argmin candidate (including Z0 itself as a candidate, matching the
    reference's running-min semantics).
    """
    R, zd = Z0.shape

    def eval_batch(Zs):  # [N, R, zd] -> [N]
        def one(Zc):
            return criterion(gen_apply(Zc))
        return jax.lax.map(one, Zs, batch_size=chunk)

    k1, k2 = jax.random.split(key)

    cand_g = jax.random.normal(k1, (num_global, R, zd))
    cand_g = jnp.concatenate([Z0[None], cand_g], axis=0)
    costs_g = eval_batch(cand_g)
    best_g = cand_g[jnp.argmin(costs_g)]

    cand_l = best_g[None] + local_scale * jax.random.normal(
        k2, (num_local, R, zd))
    cand_l = jnp.concatenate([best_g[None], cand_l], axis=0)
    costs_l = eval_batch(cand_l)
    return cand_l[jnp.argmin(costs_l)]
