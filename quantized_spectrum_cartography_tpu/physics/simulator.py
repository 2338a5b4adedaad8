"""Synthetic radio-map simulator: the JAX replacement for the MATLAB L0
layer (`qmc/generate_map.m`, `qmc/generate_test_data.m`,
`backup/algorithms/generate_data_for_comparison.m`).

Everything is functional over PRNG keys, jittable, and vmappable over a
batch-of-maps axis; the only host-side piece is the cached Cholesky factor
of the shadowing correlation kernel (physics/shadowing.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from quantized_spectrum_cartography_tpu.config import PhysicsConfig
from quantized_spectrum_cartography_tpu.data.fixtures import Problem
from quantized_spectrum_cartography_tpu.physics import psd as psd_mod
from quantized_spectrum_cartography_tpu.physics.shadowing import (
    correlation_cholesky,
    sample_shadowing,
)


def path_loss(dist: jnp.ndarray, d0: float, alpha) -> jnp.ndarray:
    """min(1, (d/d0)^-alpha)  (generate_map.m:90-91)."""
    safe = jnp.maximum(dist, 1e-12)
    return jnp.minimum(1.0, jnp.power(safe / d0, -alpha))


def sample_slf(
    key: jax.Array,
    chol: jnp.ndarray,
    cfg: PhysicsConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One spatial loss field S_r [I, J] (Frobenius-normalized) + emitter
    location (x, y).  Reference: generate_map.m:104-120."""
    I = cfg.grid_size
    k_loc, k_alpha, k_shadow = jax.random.split(key, 3)
    loc = (I - 1.0) * jax.random.uniform(k_loc, (2,))          # 50*rand
    pts = jnp.arange(I, dtype=jnp.float32)
    Xm, Ym = jnp.meshgrid(pts, pts)                            # grid coords
    dist = jnp.sqrt(jnp.square(Xm - loc[0]) + jnp.square(Ym - loc[1]))
    alpha = cfg.alpha_lo + cfg.alpha_spread * jax.random.uniform(k_alpha, ())
    shadow_db = sample_shadowing(k_shadow, chol, I, cfg.shadow_sigma)
    shadow_linear = jnp.power(10.0, shadow_db / 10.0)
    S = path_loss(dist, cfg.path_loss_d0, alpha) * shadow_linear
    S = S / jnp.linalg.norm(S.reshape(-1))
    return S, loc


def generate_map(
    key: jax.Array,
    cfg: PhysicsConfig,
    chol: Optional[jnp.ndarray] = None,
):
    """Full radio map: T [K, I, J], S [R, I, J], C [R, K], peaks [R, 2].

    Reference: generate_map.m:1-133 (basis/separable semantics preserved;
    PSD columns L2-normalized, SLFs Frobenius-normalized, tensor assembled
    as sum of outer products — here one einsum).
    """
    if chol is None:
        chol = jnp.asarray(
            correlation_cholesky(cfg.grid_size, cfg.decorrelation_distance))
    R, K = cfg.num_emitters, cfg.num_bands
    k_psd, k_slf, k_shared = jax.random.split(key, 3)

    shared = None
    if not cfg.separable:
        cand = jnp.arange(10, K - 1, 2, dtype=jnp.float32)
        perm = jax.random.permutation(k_shared, cand.shape[0])
        shared = cand[perm[: cfg.num_peaks_per_psd - 1]]

    C_rows = []
    for r in range(R):
        c = psd_mod.sample_psd(
            jax.random.fold_in(k_psd, r), r, K,
            basis=cfg.psd_basis, separable=cfg.separable,
            num_peaks=cfg.num_peaks_per_psd, shared_peaks=shared)
        C_rows.append(c)
    C = jnp.stack(C_rows)                                   # [R, K]
    C, _ = psd_mod.column_normalize(C, axis=-1)

    slf_keys = jax.random.split(k_slf, R)
    S, peaks = jax.vmap(lambda k: sample_slf(k, chol, cfg))(slf_keys)

    T = jnp.einsum("rij,rk->kij", S, C)
    return T, S, C, peaks


def generate_map_batch(key: jax.Array, cfg: PhysicsConfig, batch: int):
    """vmapped batch of maps sharing one cached Cholesky factor."""
    chol = jnp.asarray(
        correlation_cholesky(cfg.grid_size, cfg.decorrelation_distance))
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda k: generate_map(k, cfg, chol))(keys)


def generate_onebit_problem(
    key: jax.Array,
    cfg: PhysicsConfig = PhysicsConfig(),
    sample_fraction: float = 1.0,
) -> Problem:
    """Equivalent of `qmc/generate_test_data.m:45-80`: gaussian-basis
    separable map, 1-bit threshold at mean_slf, per-location random mask."""
    k_map, k_mask = jax.random.split(key)
    T, S, C, peaks = generate_map(k_map, cfg)
    T = jnp.maximum(T, 0.0)
    T_1bit = jnp.where(T > cfg.mean_slf, 1.0, -1.0)
    IJ = cfg.grid_size * cfg.grid_size
    num = int(round(sample_fraction * IJ))
    perm = jax.random.permutation(k_mask, IJ)
    Om = jnp.zeros((IJ,), bool).at[perm[:num]].set(True)
    Om = Om.reshape(cfg.grid_size, cfg.grid_size)
    return Problem(T_true=T, S_true=S, C_true=C, T_1bit=T_1bit, Om=Om,
                   mean_slf=cfg.mean_slf, peaks=peaks)


def sample_entry_mask(
    key: jax.Array, shape: Tuple[int, ...], fraction: float
) -> jnp.ndarray:
    """Per-entry Bernoulli(f) observation mask — the qmc.ipynb cell 1 mask
    model (`Om = torch.bernoulli(torch.ones((64,1,51,51))*f)`)."""
    return jax.random.bernoulli(key, fraction, shape).astype(jnp.float32)
