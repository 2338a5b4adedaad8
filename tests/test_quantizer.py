"""Quantizer parity: searchsorted binning vs the reference's boundary-loop
semantics (`qmc/quantization_model.py:8-20`), implemented here as an
independent numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from quantized_spectrum_cartography_tpu.ops import boundaries as B
from quantized_spectrum_cartography_tpu.ops import quantizer as Q


def oracle_bins(noisy, bb):
    """Loop semantics: Y=i where bb[i] < x <= bb[i+1], i in 1..n-2, last
    boundary treated as +inf; everything <= bb[1] stays 0."""
    bb = np.array(bb, dtype=np.float64).copy()
    bb[-1] = np.inf
    Y = np.zeros(noisy.shape, dtype=np.int64)
    for i in range(1, len(bb) - 1):
        Y[np.logical_and(bb[i] < noisy, noisy <= bb[i + 1])] = i
    return Y


def test_bin_indices_match_loop_oracle(rng):
    for bb in [
        B.QUANTIZATION_BOUNDARIES_4_BINS_LOG,
        B.QUANTIZATION_BOUNDARIES_7_ADJUSTED,
        B.QUANTIZATION_BOUNDARIES_16_ADJUSTED,
        B.QUANTIZATION_BOUNDARIES_8_BINS_SAMPLE,
    ]:
        lo, hi = min(bb) - 1, max(bb) + 1
        x = rng.uniform(lo, hi, size=5000)
        # include exact boundary values (tie-breaking: b_i < x is strict)
        x = np.concatenate([x, np.array(bb)])
        got = Q._bin_indices(jnp.asarray(x), jnp.asarray(np.array(bb)))
        want = oracle_bins(x, bb)
        np.testing.assert_array_equal(np.asarray(got), want)


def test_quantize_log_distribution(rng):
    key = jax.random.PRNGKey(0)
    X = jnp.asarray(rng.uniform(0, 0.01, size=(64, 51, 51)), jnp.float32)
    bb = jnp.asarray(np.array(B.QUANTIZATION_BOUNDARIES_4_BINS_LOG))
    Y = Q.quantize_log(key, X, 1.0, bb, B.LOG_OFFSET_4)
    assert Y.dtype == jnp.int32
    assert int(Y.min()) >= 0 and int(Y.max()) <= 3
    # noiseless quantization must equal direct binning of log(X+offset)
    Y0 = Q.quantize_log(key, X, 0.0, bb, B.LOG_OFFSET_4)
    want = oracle_bins(np.log(np.asarray(X) + B.LOG_OFFSET_4), np.asarray(bb))
    np.testing.assert_array_equal(np.asarray(Y0), want)


def test_dequantize_midpoints():
    bb = jnp.asarray(np.array(B.QUANTIZATION_BOUNDARIES_7_ADJUSTED))
    Y = jnp.arange(len(bb) - 1)
    mids = Q.dequantize_midpoints(Y, bb)
    want = (np.asarray(bb)[:-1] + np.asarray(bb)[1:]) / 2
    np.testing.assert_allclose(np.asarray(mids), want, rtol=1e-6)


def test_links_match_scipy(rng):
    from scipy.stats import norm

    y = jnp.asarray(rng.normal(0, 3, size=1000), jnp.float32)
    std = 1.7
    got = Q.F_probit(y, std)
    # reference scale: erf(y/(std*1.414213)) == Phi(y*sqrt2/(std*1.414213))
    want = norm.cdf(np.asarray(y) * np.sqrt(2) / (std * 1.414213))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(Q.F_sigmoid(y)), 1 / (1 + np.exp(-np.asarray(y))), atol=1e-6
    )


def test_dither_probit_rate():
    key = jax.random.PRNGKey(42)
    y = jnp.full((20000,), 0.5)
    z = Q.dither_probit(key, y, 1.0)
    from scipy.stats import norm

    p = norm.cdf(0.5)
    assert abs(float(z.mean()) - p) < 0.02


def test_bit_packing_roundtrip(rng):
    from quantized_spectrum_cartography_tpu.ops.quantizer import (
        pack_bits_host,
        unpack_bits,
    )

    y = rng.integers(0, 2, (5, 64, 51)).astype(np.float32)
    packed = pack_bits_host(y)
    assert packed.dtype == np.uint8
    assert packed.shape == (5, 64, 7)          # ceil(51/8)
    back = np.asarray(unpack_bits(jnp.asarray(packed), 51))
    np.testing.assert_array_equal(back, y)
