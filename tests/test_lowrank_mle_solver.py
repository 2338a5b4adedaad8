"""End-to-end: 1-bit low-rank MLE recovery drives NMSE well below the
zero-estimate baseline (NMSE(0, T)=1) on a synthetic instance, matching the
reference protocol (backup/notebooks/onebit_lowrank.ipynb on
onebitdata .mat fixtures; here the instance comes from our simulator)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_spectrum_cartography_tpu.config import PhysicsConfig, SolverConfig
from quantized_spectrum_cartography_tpu.ops.quantizer import dither_probit
from quantized_spectrum_cartography_tpu.physics import generate_onebit_problem
from quantized_spectrum_cartography_tpu.solvers.lowrank_mle import recover_lowrank_mle


def _make_problem(grid=31, bands=32):
    cfg = PhysicsConfig(grid_size=grid, num_bands=bands,
                        decorrelation_distance=30.0)
    return cfg, generate_onebit_problem(jax.random.PRNGKey(0), cfg,
                                        sample_fraction=1.0)


def test_lowrank_mle_reduces_nmse():
    cfg, prob = _make_problem()
    mean, std = cfg.mean_slf, 0.008
    key = jax.random.PRNGKey(1)
    # dithered 1-bit observations z ~ Bernoulli(Phi((T-mean)/std))
    T_obs = dither_probit(key, prob.T_true - mean, std)

    R, I, J, K = prob.shape
    scfg = SolverConfig(max_iters=30, s_inner_iters=5, c_inner_iters=5,
                        lr_s=0.001, lr_c=0.001, projection_interval=5,
                        rank_truncation=10)
    S0 = 0.01 * jax.random.normal(jax.random.PRNGKey(2), (R, I, J))
    C0 = 0.01 * jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (R, K)))

    res = recover_lowrank_mle(
        T_obs, S0, C0, scfg, mean, std, probit=True, T_true=prob.T_true)

    costs = np.asarray(res.costs)
    nmses = np.asarray(res.nmses)
    assert np.all(np.isfinite(costs))
    assert costs[-1] < costs[0]
    assert nmses[-1] < 0.95  # well below the trivial zero estimate
    assert np.all(np.asarray(res.C) >= 0.0)  # projection applied


def test_lowrank_mle_joint_variant_runs():
    cfg, prob = _make_problem(grid=21, bands=16)
    mean, std = cfg.mean_slf, 0.008
    T_obs = dither_probit(jax.random.PRNGKey(1), prob.T_true - mean, std)
    R, I, J, K = prob.shape
    scfg = SolverConfig(max_iters=10, lr_s=1.0, rank_truncation=10,
                        nonneg_slf=True)
    S0 = jnp.zeros((R, I, J))
    C0 = jnp.zeros((R, K))
    res = recover_lowrank_mle(
        T_obs, S0, C0, scfg, mean, std, joint=True, T_true=prob.T_true)
    assert np.all(np.isfinite(np.asarray(res.costs)))
    assert np.all(np.asarray(res.S) >= 0.0)
    assert np.all(np.asarray(res.C) >= 0.0)


def test_lowrank_mle_vmappable():
    cfg, prob = _make_problem(grid=21, bands=16)
    mean, std = cfg.mean_slf, 0.008
    R, I, J, K = prob.shape
    scfg = SolverConfig(max_iters=3, s_inner_iters=1, c_inner_iters=1)
    B = 3
    T_obs = jnp.stack([
        dither_probit(jax.random.PRNGKey(i), prob.T_true - mean, std)
        for i in range(B)])
    S0 = jnp.zeros((B, R, I, J))
    C0 = jnp.zeros((B, R, K))
    res = jax.vmap(
        lambda t, s, c: recover_lowrank_mle(t, s, c, scfg, mean, std)
    )(T_obs, S0, C0)
    assert res.S.shape == (B, R, I, J)
    assert res.T_hat.shape == (B, K, I, J)
