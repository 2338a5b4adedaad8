"""Reconstruction einsum vs loop oracle; projections; boundary estimators."""

import jax.numpy as jnp
import numpy as np

from quantized_spectrum_cartography_tpu.ops import boundaries as B
from quantized_spectrum_cartography_tpu.ops import lowrank as LR


def oracle_get_tensor(S, C):
    R, I, J = S.shape
    K = C.shape[1]
    T = np.zeros((K, I, J))
    for r in range(R):
        for k in range(K):
            T[k] += S[r] * C[r, k]
    return T


def test_get_tensor_matches_loop(rng):
    S = rng.normal(size=(2, 51, 51)).astype(np.float32)
    C = rng.normal(size=(2, 64)).astype(np.float32)
    got = LR.get_tensor(jnp.asarray(S), jnp.asarray(C))
    np.testing.assert_allclose(
        np.asarray(got), oracle_get_tensor(S, C), rtol=1e-4, atol=1e-6)
    # torch-channel layout [R,1,I,J]
    got2 = LR.get_tensor(jnp.asarray(S[:, None]), jnp.asarray(C))
    np.testing.assert_allclose(np.asarray(got2), np.asarray(got), rtol=1e-6)


def test_get_tensor_flat_consistent(rng):
    S = rng.normal(size=(3, 51, 51)).astype(np.float32)
    C = rng.normal(size=(3, 64)).astype(np.float32)
    T = LR.get_tensor(jnp.asarray(S), jnp.asarray(C))
    Tf = LR.get_tensor_flat(jnp.asarray(S.reshape(3, -1)), jnp.asarray(C))
    np.testing.assert_allclose(
        np.asarray(Tf), np.asarray(T).reshape(64, -1), rtol=1e-5
    )


def test_outer(rng):
    m = rng.normal(size=(5, 7)).astype(np.float32)
    v = rng.normal(size=(3,)).astype(np.float32)
    got = LR.outer(jnp.asarray(m), jnp.asarray(v))
    want = np.stack([m * vi for vi in v])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_project_rank(rng):
    S = rng.normal(size=(2, 51, 51)).astype(np.float32)
    out = np.asarray(LR.project_rank(jnp.asarray(S), 10))
    for r in range(2):
        assert np.linalg.matrix_rank(out[r], tol=1e-3) <= 10
    # rank-truncation of an already low-rank matrix is identity
    lowS = (rng.normal(size=(2, 51, 3)) @ rng.normal(size=(2, 3, 51))).astype(np.float32)
    out2 = np.asarray(LR.project_rank(jnp.asarray(lowS), 10))
    np.testing.assert_allclose(out2, lowS, atol=1e-3)


def test_project_rank_subspace_matches_svd(rng):
    # SLF-like fast-decaying spectrum: randomized subspace projection must
    # agree with exact SVD truncation to well under the truncation error
    U = rng.normal(size=(8, 51, 12))
    V = rng.normal(size=(8, 12, 51))
    sv = np.exp(-np.arange(12) * 0.7)
    S = jnp.asarray(((U * sv) @ V + 1e-3 * rng.normal(size=(8, 51, 51)))
                    .astype(np.float32))
    exact = np.asarray(LR.project_rank(S, 10))
    fast = np.asarray(LR.project_rank_subspace(S, 10))
    rel = np.linalg.norm(fast - exact) / np.linalg.norm(exact)
    assert rel < 2e-2, rel
    for r in range(8):
        assert np.linalg.matrix_rank(fast[r], tol=1e-3) <= 10
    # already low-rank input passes through (near-)unchanged
    lowS = (rng.normal(size=(2, 51, 3)) @
            rng.normal(size=(2, 3, 51))).astype(np.float32)
    out = np.asarray(LR.project_rank_subspace(jnp.asarray(lowS), 10))
    np.testing.assert_allclose(out, lowS, atol=1e-3)


def test_pad_spatial():
    x = jnp.ones((4, 2601))
    p = LR.pad_spatial(x)
    assert p.shape == (4, 2688)
    assert float(p[:, 2601:].sum()) == 0.0


def test_find_boundaries_equal_count(rng):
    data = jnp.asarray(rng.exponential(size=20000).astype(np.float32))
    bounds, sd = B.find_boundaries(data, num_bins=8)
    assert len(bounds) == 9
    assert np.all(np.diff(bounds) > 0)
    counts, _ = np.histogram(np.asarray(data), bins=bounds)
    # roughly equal mass per bin
    assert counts.min() > 0.7 * counts.mean()


def test_fit_log_offset_recovers_known_offset():
    f_true, b_true = 3e-5, 0.7
    y = np.arange(8, dtype=np.float64)
    x = np.exp(y - b_true) - f_true  # exact model inversion
    f, b, transformed = B.fit_log_offset(x)
    assert abs(f - f_true) / f_true < 1e-3
    assert abs(b - b_true) < 1e-3
    np.testing.assert_allclose(np.asarray(transformed) + b, y, atol=1e-3)
