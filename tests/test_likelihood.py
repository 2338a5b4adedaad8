"""Likelihood correctness: direct vs log-space formulations, tail stability,
gradient finiteness, and the 1-bit BCE loss vs a scipy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import norm

from quantized_spectrum_cartography_tpu.ops import boundaries as B
from quantized_spectrum_cartography_tpu.ops import likelihood as L

SQRT2_REF = 1.414213


def oracle_prob(Y, X, bb, std, clamp=None):
    bb = np.array(bb, dtype=np.float64).copy()
    if clamp is not None:
        bb[0], bb[-1] = -clamp, clamp
    W, U = bb[Y], bb[Y + 1]
    s = std * SQRT2_REF / np.sqrt(2)
    return norm.cdf((U - X) / s) - norm.cdf((W - X) / s)


def test_prob_probit_matches_oracle(rng):
    bb = B.QUANTIZATION_BOUNDARIES_4_BINS_LOG
    X = rng.uniform(-20, -2, size=(64, 51)).astype(np.float32)
    Y = rng.integers(0, 4, size=X.shape)
    got = L.prob_probit(jnp.asarray(Y), jnp.asarray(X), jnp.asarray(np.array(bb)), 5.0)
    want = oracle_prob(Y, X, bb, 5.0)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_log_prob_matches_direct_in_bulk(rng):
    bb = B.QUANTIZATION_BOUNDARIES_4_BINS_LOG
    X = rng.uniform(-20, -2, size=(1000,)).astype(np.float32)
    Y = rng.integers(0, 4, size=X.shape)
    logp = L.log_prob_probit(jnp.asarray(Y), jnp.asarray(X), jnp.asarray(np.array(bb)), 5.0)
    want = np.log(oracle_prob(Y, X, bb, 5.0))
    np.testing.assert_allclose(np.asarray(logp), want, rtol=2e-4, atol=2e-5)


def test_log_prob_stable_in_tails():
    """Where Phi(u)-Phi(w) underflows in f32, log-space must stay finite."""
    bb = jnp.asarray(np.array(B.QUANTIZATION_BOUNDARIES_4_BINS_LOG))
    X = jnp.asarray([50.0, -80.0, 30.0], jnp.float32)  # far outside all bins
    Y = jnp.asarray([0, 3, 1])
    direct = L.prob_probit(Y, X, bb, 0.5)
    assert np.any(np.asarray(direct) == 0.0)  # the naive form underflows
    logp = L.log_prob_probit(Y, X, bb, 0.5)
    assert np.all(np.isfinite(np.asarray(logp)))
    # float64 oracle using the same stable log-space identity
    s = 0.5 * SQRT2_REF / np.sqrt(2)
    bbn = np.asarray(bb, np.float64)
    want = []
    for y, x in [(0, 50.0), (3, -80.0), (1, 30.0)]:
        a, b = (bbn[y] - x) / s, (bbn[y + 1] - x) / s
        if a + b > 0:
            a, b = -b, -a
        la, lb = norm.logcdf(a), norm.logcdf(b)
        want.append(lb + np.log(-np.expm1(min(la - lb, -1e-300))))
    np.testing.assert_allclose(np.asarray(logp), np.array(want), rtol=0.05)


def test_grad_finite_everywhere(rng):
    bb = jnp.asarray(np.array(B.QUANTIZATION_BOUNDARIES_4_BINS_LOG))
    Y = jnp.asarray(rng.integers(0, 4, size=(256,)))

    def nll(x):
        return L.masked_nll(L.log_prob_probit(Y, x, bb, 5.0))

    for scale in [1.0, 30.0, 80.0]:
        x = jnp.asarray(rng.normal(-10, scale, size=(256,)), jnp.float32)
        g = jax.grad(nll)(x)
        assert np.all(np.isfinite(np.asarray(g))), scale


def test_masked_nll(rng):
    logp = jnp.asarray(rng.normal(size=(10, 10)), jnp.float32)
    m = jnp.asarray(rng.integers(0, 2, size=(10, 10)), jnp.float32)
    got = L.masked_nll(logp, m)
    np.testing.assert_allclose(
        float(got), -float(np.sum(np.asarray(m) * np.asarray(logp))), rtol=1e-6
    )


def test_neg_likelihood_1bit_matches_bce(rng):
    x = rng.normal(0, 0.01, size=(500,)).astype(np.float32)
    t = rng.integers(0, 2, size=(500,)).astype(np.float32)
    mean, std = 0.0045, 0.008
    got = L.neg_likelihood_1bit(jnp.asarray(x), jnp.asarray(t), mean, std, probit=True)
    p = norm.cdf((x - mean) * np.sqrt(2) / (std * SQRT2_REF))
    p = np.clip(p, 1e-12, 1 - 1e-12)
    want = -(t * np.log(p) + (1 - t) * np.log(1 - p)).mean()
    np.testing.assert_allclose(float(got), want, rtol=1e-3)


def test_deterministic_cost(rng):
    T_hat = jnp.asarray(rng.uniform(0, 1, (4, 5, 5)), jnp.float32)
    T_t = jnp.asarray(rng.choice([-1.0, 1.0], (4, 5, 5)), jnp.float32)
    got = L.deterministic_cost(T_hat, T_t, mean=0.1)
    Tm = np.asarray(T_hat) - 0.1
    want = -0.001 * (Tm * np.asarray(T_t)).sum() + np.linalg.norm(Tm.ravel())
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_onebit_nll_factors_value_and_grad(rng):
    # custom-VJP factor NLL == autodiff of the generic composition, value
    # and gradients, with and without a mask
    from quantized_spectrum_cartography_tpu.ops.lowrank import get_tensor

    R, K, I, J = 2, 6, 9, 9
    mean, std = 0.0045, 0.008
    S = jnp.asarray(rng.uniform(0, 0.02, (R, I, J)), jnp.float32)
    C = jnp.asarray(rng.uniform(0, 1, (R, K)), jnp.float32)
    t = jnp.asarray(rng.integers(0, 2, (K, I, J)), jnp.float32)
    for mask in (None, jnp.asarray(rng.integers(0, 2, (K, I, J)), jnp.float32)):
        sm = L.pack_sign_mask(t, mask)
        assert sm.dtype == jnp.int8
        inv_s = jnp.float32(1.0 / (std * L._SIGMA_EFF))
        inv_count = (1.0 / jnp.maximum(jnp.sum(mask), 1.0) if mask is not None
                     else jnp.float32(1.0 / t.size))

        def fast(S, C):
            return L.onebit_nll_factors(S, C, sm, jnp.float32(mean),
                                        inv_s, inv_count)

        def ref(S, C):
            return L.neg_likelihood_1bit(get_tensor(S, C), t, mean, std,
                                         probit=True, mask=mask)

        v1, (g1S, g1C) = jax.value_and_grad(fast, (0, 1))(S, C)
        v2, (g2S, g2C) = jax.value_and_grad(ref, (0, 1))(S, C)
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g1S), np.asarray(g2S),
                                   rtol=2e-4, atol=1e-7)
        np.testing.assert_allclose(np.asarray(g1C), np.asarray(g2C),
                                   rtol=2e-4, atol=1e-7)
    # vmappable (batched solver path)
    B = 3
    Sb = jnp.stack([S] * B); Cb = jnp.stack([C] * B)
    smb = jnp.stack([L.pack_sign_mask(t)] * B)
    vb = jax.vmap(lambda s, c, m: L.onebit_nll_factors(
        s, c, m, jnp.float32(mean), jnp.float32(1.0 / (std * L._SIGMA_EFF)),
        jnp.float32(1.0 / t.size)))(Sb, Cb, smb)
    assert vb.shape == (B,)
