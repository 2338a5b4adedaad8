"""Simulator distribution checks against the reference's closed forms
(generate_map.m / Shadowing_data.m / generate_test_data.m)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_spectrum_cartography_tpu.config import PhysicsConfig
from quantized_spectrum_cartography_tpu.physics import (
    correlation_cholesky,
    generate_map,
    generate_onebit_problem,
    path_loss,
    sample_shadowing,
    column_normalize,
    gaussian_bump,
    sinc_bump,
)

SMALL = PhysicsConfig(grid_size=21, decorrelation_distance=30.0)


def test_path_loss_clipped():
    d = jnp.asarray([0.0, 1.0, 2.0, 4.0, 10.0])
    pl = np.asarray(path_loss(d, 2.0, 2.0))
    np.testing.assert_allclose(pl, [1.0, 1.0, 1.0, 0.25, 0.04], rtol=1e-5)


def test_correlation_cholesky_reconstructs_kernel():
    L = correlation_cholesky(11, 30.0)
    R = (L @ L.T).astype(np.float64)
    p = np.exp(-1.0 / 30.0)
    # check a few known distances on the 11x11 grid (column-major order)
    assert abs(R[0, 0] - 1.0) < 1e-4
    assert abs(R[0, 1] - p) < 1e-3          # neighbors along a column
    assert abs(R[0, 11] - p) < 1e-3         # neighbors along a row


def test_shadowing_covariance_statistics():
    g = 9
    L = jnp.asarray(correlation_cholesky(g, 10.0))
    keys = jax.random.split(jax.random.PRNGKey(1), 3000)
    fields = jax.vmap(lambda k: sample_shadowing(k, L, g, 2.0))(keys)
    f = np.asarray(fields).reshape(3000, -1)
    var = f.var(axis=0).mean()
    assert abs(var - 4.0) < 0.35
    # empirical correlation between horizontally adjacent points ~ p
    c = np.corrcoef(f[:, 0], f[:, 1])[0, 1]
    assert abs(c - np.exp(-1.0 / 10.0)) < 0.08


def test_psd_bumps():
    indK = jnp.arange(1, 65, dtype=jnp.float32)
    g = np.asarray(gaussian_bump(indK, 10.0, 2.0))
    assert g.argmax() == 9 and abs(g.max() - 1.0) < 1e-6
    s = np.asarray(sinc_bump(indK, 10.0, 3.0))
    assert s.argmax() == 9
    assert s[0] == 0.0  # outside support |k-f0|/a > 1


def test_column_normalize():
    X = jnp.asarray(np.random.default_rng(0).normal(size=(5, 7)), jnp.float32)
    Xn, d = column_normalize(X, axis=-1)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(Xn), axis=-1), 1.0, rtol=1e-5)


def test_generate_map_shapes_and_normalization():
    T, S, C, peaks = generate_map(jax.random.PRNGKey(0), SMALL)
    R, I, K = SMALL.num_emitters, SMALL.grid_size, SMALL.num_bands
    assert T.shape == (K, I, I) and S.shape == (R, I, I) and C.shape == (R, K)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(S).reshape(R, -1), axis=-1), 1.0, rtol=1e-4)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(C), axis=-1), 1.0, rtol=1e-4)
    # tensor equals sum of outer products
    want = np.einsum("rij,rk->kij", np.asarray(S), np.asarray(C))
    np.testing.assert_allclose(np.asarray(T), want, atol=1e-5)
    assert np.all(np.asarray(T) >= -1e-7)


def test_generate_onebit_problem_mask_and_threshold():
    p = generate_onebit_problem(jax.random.PRNGKey(3), SMALL, sample_fraction=0.25)
    vals = np.unique(np.asarray(p.T_1bit))
    assert set(vals).issubset({-1.0, 1.0})
    frac = float(jnp.mean(p.Om.astype(jnp.float32)))
    assert abs(frac - 0.25) < 1e-2


@pytest.mark.slow
def test_full_size_map_statistics():
    """Full 51x51x64 map: mean SLF magnitude near the reference's
    mean_slf=0.0045 scale (generate_test_data.m:27)."""
    cfg = PhysicsConfig()
    T, S, C, _ = generate_map(jax.random.PRNGKey(7), cfg)
    m = float(jnp.mean(T))
    assert 1e-4 < m < 5e-2
