"""Fused-likelihood kernel parity: pallas (interpret mode on CPU) vs the
pure-jnp oracle vs the generic ops.likelihood path; value + gradient."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_spectrum_cartography_tpu.ops import boundaries as B
from quantized_spectrum_cartography_tpu.ops.likelihood import (
    gather_bin_bounds,
    log_prob_probit_bounds,
    masked_nll,
)
from quantized_spectrum_cartography_tpu.ops.pallas import (
    MASK_SENTINEL,
    fused_nll_reference,
    fused_quantized_nll,
    pack_bounds,
)
from quantized_spectrum_cartography_tpu.ops.pallas.fused_likelihood import (
    _log_ndtr,
)

K, I, J, R = 16, 20, 20, 2
IJ = I * J


@pytest.fixture
def instance(rng):
    from quantized_spectrum_cartography_tpu.ops.lowrank import pad_spatial
    S = pad_spatial(
        jnp.asarray(rng.uniform(0.0, 0.05, (R, IJ)).astype(np.float32)))
    C = jnp.asarray(rng.uniform(0.0, 1.0, (K, R)).astype(np.float32))
    Y = jnp.asarray(rng.integers(0, 4, (K, I, J)))
    mask = jnp.asarray(rng.integers(0, 2, (K, I, J)).astype(np.float32))
    return S, C, Y, mask


def test_log_ndtr_matches_scipy():
    from scipy.stats import norm
    t = jnp.asarray(np.linspace(-2000, 8, 4001, dtype=np.float32))
    got = np.asarray(_log_ndtr(t))
    want = norm.logcdf(np.asarray(t, np.float64))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)


def test_pack_bounds_layout(instance):
    S, C, Y, mask = instance
    bb = jnp.asarray(np.array(B.QUANTIZATION_BOUNDARIES_4_BINS_LOG))
    W, U = pack_bounds(Y, bb, mask)
    assert W.shape == (K, 512) and U.shape == (K, 512)  # 400 -> 512 lanes
    Wn = np.asarray(W)[:, :IJ].reshape(K, I, J)
    m = np.asarray(mask) > 0
    bbn = np.asarray(bb)
    np.testing.assert_allclose(Wn[m], bbn[np.asarray(Y)][m], rtol=1e-6)
    assert np.all(Wn[~m] == -MASK_SENTINEL)
    assert np.all(np.asarray(W)[:, IJ:] == -MASK_SENTINEL)


def test_fused_value_matches_generic_likelihood(instance):
    S, C, Y, mask = instance
    bb = jnp.asarray(np.array(B.QUANTIZATION_BOUNDARIES_4_BINS_LOG))
    sigma, offset = 5.0, B.LOG_OFFSET_4
    W, U = pack_bounds(Y, bb, mask)

    got = fused_nll_reference(S, C, W, U, sigma, offset)

    # generic path: einsum reconstruction + gather + stable logprob + mask
    T = jnp.einsum("rp,kr->kp", S[:, :IJ], C).reshape(K, I, J)
    x = jnp.log(T + offset)
    Wg, Ug = gather_bin_bounds(Y, bb)
    want = masked_nll(log_prob_probit_bounds(Wg, Ug, x, sigma), mask)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-4)


def test_pallas_interpret_matches_reference(instance):
    S, C, Y, mask = instance
    bb = jnp.asarray(np.array(B.QUANTIZATION_BOUNDARIES_4_BINS_LOG))
    sigma, offset = 5.0, B.LOG_OFFSET_4
    W, U = pack_bounds(Y, bb, mask)
    got = fused_quantized_nll(S, C, W, U, sigma, offset, True)
    want = fused_nll_reference(S, C, W, U, sigma, offset)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4)


def test_custom_vjp_matches_autodiff(instance):
    S, C, Y, mask = instance
    bb = jnp.asarray(np.array(B.QUANTIZATION_BOUNDARIES_4_BINS_LOG))
    sigma, offset = 5.0, B.LOG_OFFSET_4
    W, U = pack_bounds(Y, bb, mask)

    gS, gC = jax.grad(
        lambda s, c: fused_quantized_nll(s, c, W, U, sigma, offset, True),
        argnums=(0, 1))(S, C)
    aS, aC = jax.grad(
        lambda s, c: fused_nll_reference(s, c, W, U, sigma, offset),
        argnums=(0, 1))(S, C)
    # analytic hazard-ratio backward vs autodiff of the series-based
    # forward: identical math but different rounding paths; observed max
    # rel gap ~6e-3 on TPU f32
    np.testing.assert_allclose(np.asarray(gS), np.asarray(aS),
                               rtol=1.5e-2, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gC), np.asarray(aC),
                               rtol=1.5e-2, atol=2e-4)


def test_masked_and_padded_entries_do_not_contribute(instance):
    S, C, Y, mask = instance
    bb = jnp.asarray(np.array(B.QUANTIZATION_BOUNDARIES_4_BINS_LOG))
    sigma, offset = 5.0, B.LOG_OFFSET_4
    W0, U0 = pack_bounds(Y, bb, jnp.zeros_like(mask))   # all masked out
    val = float(fused_nll_reference(S, C, W0, U0, sigma, offset))
    assert abs(val) < 1e-3
    g = jax.grad(lambda s: fused_nll_reference(s, C, W0, U0, sigma, offset))(S)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)


def test_small_sigma_stability(instance):
    """sigma=0.008 (the reference's sharpest probit) must stay finite."""
    S, C, Y, mask = instance
    bb = jnp.asarray(np.array(B.QUANTIZATION_BOUNDARIES_4_BINS_LOG))
    W, U = pack_bounds(Y, bb, mask)
    val = fused_nll_reference(S, C, W, U, 0.008, B.LOG_OFFSET_4)
    assert np.isfinite(float(val))
    gS = jax.grad(
        lambda s: fused_nll_reference(s, C, W, U, 0.008, B.LOG_OFFSET_4))(S)
    assert np.all(np.isfinite(np.asarray(gS)))


def test_vmap_batching(instance):
    S, C, Y, mask = instance
    bb = jnp.asarray(np.array(B.QUANTIZATION_BOUNDARIES_4_BINS_LOG))
    sigma, offset = 5.0, B.LOG_OFFSET_4
    W, U = pack_bounds(Y, bb, mask)
    B_ = 3
    Sb = jnp.stack([S * (1.0 + 0.1 * i) for i in range(B_)])
    Cb = jnp.stack([C] * B_)
    vals = jax.vmap(
        lambda s, c: fused_nll_reference(s, c, W, U, sigma, offset)
    )(Sb, Cb)
    assert vals.shape == (B_,)
    singles = [float(fused_nll_reference(Sb[i], Cb[i], W, U, sigma, offset))
               for i in range(B_)]
    np.testing.assert_allclose(np.asarray(vals), singles, rtol=1e-5)


def test_pack_bounds_1bit_matches_bce(rng):
    """2-bin linear-link fused NLL == reference probit BCE (up to mean)."""
    from quantized_spectrum_cartography_tpu.ops.likelihood import (
        neg_likelihood_1bit,
    )
    from quantized_spectrum_cartography_tpu.ops.lowrank import pad_spatial
    from quantized_spectrum_cartography_tpu.ops.pallas import pack_bounds_1bit

    S = pad_spatial(jnp.asarray(
        rng.uniform(0, 0.01, (R, IJ)).astype(np.float32)))
    C = jnp.asarray(rng.uniform(0, 1, (K, R)).astype(np.float32))
    y01 = jnp.asarray(rng.integers(0, 2, (K, I, J)).astype(np.float32))
    mask = jnp.asarray(rng.integers(0, 2, (K, I, J)).astype(np.float32))
    mean, std = 0.0045, 0.008
    W, U = pack_bounds_1bit(y01, mean, mask)
    nll = fused_nll_reference(S, C, W, U, std, 0.0, linear=True)
    got = float(nll / jnp.sum(mask))

    T = jnp.einsum("rp,kr->kp", S[:, :IJ], C).reshape(K, I, J)
    want = float(neg_likelihood_1bit(T, y01, mean, std, True, mask=mask))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_fast_path_matches_robust_in_bulk(instance):
    """sigma=5 (headline): fast erf-difference vs robust log-space path."""
    S, C, Y, mask = instance
    bb = jnp.asarray(np.array(B.QUANTIZATION_BOUNDARIES_4_BINS_LOG))
    sigma, offset = 5.0, B.LOG_OFFSET_4
    W, U = pack_bounds(Y, bb, mask)
    robust = fused_nll_reference(S, C, W, U, sigma, offset, fast=False)
    fastv = fused_nll_reference(S, C, W, U, sigma, offset, fast=True)
    np.testing.assert_allclose(float(fastv), float(robust), rtol=1e-3)
    gr = jax.grad(lambda s: fused_nll_reference(s, C, W, U, sigma, offset,
                                                fast=False))(S)
    gf = jax.grad(lambda s: fused_nll_reference(s, C, W, U, sigma, offset,
                                                fast=True))(S)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=2e-2, atol=2e-4)


def test_coded_kernel_matches_bounds_kernel(rng):
    """Coded (int8) kernels: value+grad parity with the (W,U) kernels in
    interpret mode, ordinal 4-bin log-link and 1-bit linear-link cases."""
    from quantized_spectrum_cartography_tpu.ops.pallas.fused_likelihood import (
        fused_quantized_nll,
        fused_quantized_nll_coded,
        onebit_bounds,
        pack_bounds,
        pack_bounds_1bit,
        pack_codes,
        pack_codes_1bit,
        MASK_SENTINEL,
    )
    from quantized_spectrum_cartography_tpu.ops import boundaries as BND

    R, K, IJ = 2, 8, 256
    sigma, offset = 5.0, BND.LOG_OFFSET_4
    S = jnp.asarray(rng.uniform(0.001, 0.05, (R, IJ)), jnp.float32)
    C = jnp.asarray(rng.uniform(0.0, 1.0, (K, R)), jnp.float32)
    Y = jnp.asarray(rng.integers(0, 4, (K, IJ)))
    mask = jnp.asarray(rng.integers(0, 2, (K, IJ)).astype(np.float32))
    bb = jnp.asarray(np.array(BND.QUANTIZATION_BOUNDARIES_4_BINS_LOG))

    W, U = pack_bounds(Y, bb, mask)
    Yc = pack_codes(Y, 4, mask)
    assert Yc.dtype == jnp.int8
    bbt = tuple(float(v) for v in np.array(BND.QUANTIZATION_BOUNDARIES_4_BINS_LOG))

    f_ref = lambda s, c: fused_quantized_nll(s, c, W, U, sigma, offset, True)
    f_cod = lambda s, c: fused_quantized_nll_coded(s, c, Yc, bbt, sigma,
                                                   offset, True)
    v1, g1 = jax.value_and_grad(f_ref, (0, 1))(S, C)
    v2, g2 = jax.value_and_grad(f_cod, (0, 1))(S, C)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-5)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)

    # 1-bit linear case
    mean, std = 0.0045, 0.008
    y01 = jnp.asarray(rng.integers(0, 2, (K, IJ)).astype(np.float32))
    Wb, Ub = pack_bounds_1bit(y01, mean, mask)
    Yc1 = pack_codes_1bit(y01, mask)
    f1 = lambda s, c: fused_quantized_nll(s, c, Wb, Ub, std, 0.0, True,
                                          True)
    f2 = lambda s, c: fused_quantized_nll_coded(
        s, c, Yc1, onebit_bounds(mean), std, 0.0, True, True)
    v1, g1 = jax.value_and_grad(f1, (0, 1))(S, C)
    v2, g2 = jax.value_and_grad(f2, (0, 1))(S, C)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-5)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)

    # masked entries contribute exactly zero gradient
    gS = np.asarray(g2[0])
    assert np.all(np.isfinite(gS))


def test_onebit_specialized_kernel_parity(rng):
    """Specialized 1-bit kernel == generic fused kernel on 1-bit bounds,
    value and gradients, interpret mode, with and without mask."""
    from quantized_spectrum_cartography_tpu.ops.pallas.fused_likelihood import (
        fused_onebit_nll,
        fused_quantized_nll,
        pack_bounds_1bit,
        pack_codes_1bit,
    )

    R, K, IJ = 2, 8, 256
    mean, std = 0.0045, 0.008
    S = jnp.asarray(rng.uniform(0.001, 0.05, (R, IJ)), jnp.float32)
    C = jnp.asarray(rng.uniform(0.0, 1.0, (K, R)), jnp.float32)
    y01 = jnp.asarray(rng.integers(0, 2, (K, IJ)).astype(np.float32))
    for mask in (None,
                 jnp.asarray(rng.integers(0, 2, (K, IJ)).astype(np.float32))):
        W, U = pack_bounds_1bit(y01, mean, mask)
        Yc = pack_codes_1bit(y01, mask)
        f_gen = lambda s, c: fused_quantized_nll(s, c, W, U, std, 0.0,
                                                 True, True)
        f_1b = lambda s, c: fused_onebit_nll(s, c, Yc, mean, std, True)
        v1, g1 = jax.value_and_grad(f_gen, (0, 1))(S, C)
        v2, g2 = jax.value_and_grad(f_1b, (0, 1))(S, C)
        np.testing.assert_allclose(float(v2), float(v1), rtol=5e-5)
        # grad tolerance: the specialized bwd uses the direct piecewise
        # hazard ratio (max rel err ~1e-3 at its t=-4 branch point) vs the
        # generic kernel's exp(log-diff) form
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-3, atol=2e-5)
        assert np.all(np.isfinite(np.asarray(g2[0])))
