"""BTD baseline, completion solvers, Nasdac, dict builders, profiling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_spectrum_cartography_tpu.baselines.btd import btd_ll1
from quantized_spectrum_cartography_tpu.models.builders import (
    DictDiscriminator,
    GANEncoder,
    InvalidArchitectureError,
    trace_encoder_shapes,
)
from quantized_spectrum_cartography_tpu.solvers.completion import (
    optimize_z,
    recover_dowjons_unquantized,
    recover_masked_mse,
)
from quantized_spectrum_cartography_tpu.solvers.nasdac import recover_nasdac
from quantized_spectrum_cartography_tpu.utils import (
    likelihood_roofline,
    time_jitted,
)


def _toy_gen(z_dim=16, I=24):
    """Deterministic linear 'generator' for solver machinery tests."""
    key = jax.random.PRNGKey(0)
    Wm = jax.random.normal(key, (z_dim, I * I)) / np.sqrt(z_dim)

    def gen(Z):
        return jax.nn.sigmoid(Z @ Wm).reshape(Z.shape[0], I, I)

    return gen


def test_btd_ll1_fits_low_rank_tensor(rng):
    R, L, I, J, K = 2, 3, 16, 16, 8
    A = rng.normal(size=(R, I, L)).astype(np.float32)
    Bm = rng.normal(size=(R, J, L)).astype(np.float32)
    C = np.abs(rng.normal(size=(R, K))).astype(np.float32)
    S = np.einsum("ril,rjl->rij", A, Bm)
    T = jnp.asarray(np.einsum("rij,rk->kij", S, C))
    S_hat, C_hat, T_hat = btd_ll1(T, R=R, L=L, iters=60,
                                  key=jax.random.PRNGKey(1), restarts=4)
    rel = float(jnp.linalg.norm((T_hat - T).reshape(-1)) /
                jnp.linalg.norm(T.reshape(-1)))
    assert rel < 0.1
    assert np.all(np.asarray(C_hat) >= 0)


def test_btd_ll1_masked(rng):
    R, L, I, K = 2, 2, 12, 6
    A = rng.normal(size=(R, I, L)).astype(np.float32)
    Bm = rng.normal(size=(R, I, L)).astype(np.float32)
    C = np.abs(rng.normal(size=(R, K))).astype(np.float32)
    T = jnp.asarray(np.einsum("ril,rjl,rk->kij", A, Bm, C))
    mask = jnp.asarray(rng.integers(0, 2, T.shape).astype(np.float32))
    _, _, T_hat = btd_ll1(T, R=R, L=L, iters=60, mask=mask,
                          key=jax.random.PRNGKey(2), restarts=4)
    # fits observed entries
    obs_rel = float(jnp.linalg.norm((mask * (T_hat - T)).reshape(-1)) /
                    jnp.linalg.norm((mask * T).reshape(-1)))
    assert obs_rel < 0.15


def test_recover_masked_mse_improves(rng):
    gen = _toy_gen()
    z_true = jax.random.normal(jax.random.PRNGKey(3), (1, 16))
    S_true = gen(z_true)[0]
    mask = jnp.asarray(rng.integers(0, 2, S_true.shape).astype(np.float32))
    S_hat, z, losses = recover_masked_mse(
        jax.random.PRNGKey(4), gen, mask, S_true * mask,
        z_dim=16, num_global=16, num_local=16, adam_steps=50)
    l = np.asarray(losses)
    assert l[-1] < l[0]
    assert S_hat.shape == S_true.shape


def test_optimize_z_matches_targets(rng):
    gen = _toy_gen()
    z_true = jax.random.normal(jax.random.PRNGKey(5), (2, 16))
    S_true = gen(z_true)
    S_hat, z = optimize_z(jax.random.PRNGKey(6), gen, S_true,
                          adam_steps=100, z_dim=16)
    mse = float(jnp.mean(jnp.square(S_hat - S_true)))
    assert mse < float(jnp.mean(jnp.square(gen(jnp.zeros((2, 16)))
                                           - S_true)))


def test_dowjons_unquantized_runs(rng):
    gen = _toy_gen(I=24)
    z_true = jax.random.normal(jax.random.PRNGKey(7), (2, 16))
    S_true = gen(z_true)
    C_true = jnp.abs(jax.random.normal(jax.random.PRNGKey(8), (2, 8)))
    T_true = jnp.einsum("rij,rk->kij", S_true, C_true)
    Om = jnp.asarray(rng.integers(0, 2, (24, 24)).astype(bool))
    res = recover_dowjons_unquantized(
        jax.random.PRNGKey(9), T_true * Om[None], Om, gen,
        num_emitters=2, z_dim=16, outer_iters=4, z_steps_per_iter=5,
        T_true=T_true)
    assert np.all(np.isfinite(np.asarray(res.costs)))
    assert np.all(np.asarray(res.C) >= 0)


def test_nasdac_pipeline(rng):
    K, I, R = 8, 16, 2
    C = np.abs(rng.normal(size=(R, K))).astype(np.float32) * 0.05
    C[0, 1] = 1.0
    C[1, 5] = 1.0
    S = rng.uniform(0, 1, size=(R, I, I)).astype(np.float32)
    T = jnp.asarray(np.einsum("rij,rk->kij", S, C))
    Om = jnp.ones((I, I), bool)

    def identity_complete(mask, slf):
        return slf    # perfect 'AE'

    res = recover_nasdac(T, Om, identity_complete, num_emitters=R)
    rel = float(jnp.linalg.norm((res.T_hat - T).reshape(-1)) /
                jnp.linalg.norm(T.reshape(-1)))
    assert rel < 0.1


def test_dict_encoder_and_shape_validation():
    enc = GANEncoder()
    x = jnp.zeros((2, 51, 51, 1))
    v = enc.init(jax.random.PRNGKey(0), x, train=False)
    z = enc.apply(v, x, train=False)
    assert z.shape == (2, 64)
    with pytest.raises(InvalidArchitectureError):
        trace_encoder_shapes({
            "conv_layers": 3,
            "conv_channels": [8, 8, 8],
            "conv_kernel_sizes": [(9, 9)] * 3,
            "conv_strides": [(4, 4)] * 3,
            "conv_paddings": [(0, 0)] * 3,
            "z_dimension": 8}, (20, 20))
    d = DictDiscriminator(z_dimension=64)
    vd = d.init(jax.random.PRNGKey(1), jnp.zeros((3, 64)))
    out = d.apply(vd, jnp.zeros((3, 64)))
    assert out.shape == (3, 1)


def test_profiling_helpers():
    f = jax.jit(lambda x: x * 2.0)
    stats = time_jitted(f, jnp.ones((64, 64)), iters=5)
    assert stats["compile_s"] > 0 and stats["per_call_us"] > 0
    r = likelihood_roofline(256, 64, 2688, 2, measured_us=3000.0)
    assert 0 < r["pct_hbm_peak"] < 100
    assert r["bound"] in ("bandwidth", "compute")


def test_vae_prior_generator_and_encoder_init():
    from quantized_spectrum_cartography_tpu.models import VAE
    from quantized_spectrum_cartography_tpu.solvers import (
        encoder_init,
        make_vae_generator,
    )

    vae = VAE(latent_dim=8)
    x = jnp.zeros((1, 51, 51, 2))
    variables = vae.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1),
                         train=False)
    gen = make_vae_generator(variables, latent_dim=8)
    out = gen(jnp.zeros((3, 8)))
    assert out.shape == (3, 51, 51)
    z0 = encoder_init(variables, jnp.ones((51, 51)),
                      jnp.zeros((51, 51)), latent_dim=8)
    assert z0.shape == (1, 8)
    z0r = encoder_init(variables, jnp.ones((51, 51)),
                       jnp.zeros((2, 51, 51)), latent_dim=8)
    assert z0r.shape == (2, 8)


def test_recalibrate_gain_recovers_true_scale(rng):
    """Quantize gamma*T, hand the solver T: calibration must find gamma."""
    import quantized_spectrum_cartography_tpu.ops.boundaries as B
    from quantized_spectrum_cartography_tpu.ops.quantizer import quantize_log
    from quantized_spectrum_cartography_tpu.solvers import recalibrate_gain

    T = jnp.asarray(rng.uniform(0, 0.01, (16, 21, 21)).astype(np.float32))
    bb = jnp.asarray(np.array(B.QUANTIZATION_BOUNDARIES_16_ADJUSTED))
    offset, sigma = B.LOG_OFFSET_16_ADJUSTED, 0.3
    gamma_true = 4.2
    Y = quantize_log(jax.random.PRNGKey(0), gamma_true * T, sigma, bb, offset)
    gamma, T_cal = recalibrate_gain(T, Y, bb, sigma, offset)
    assert abs(float(gamma) - gamma_true) / gamma_true < 0.15
    np.testing.assert_allclose(np.asarray(T_cal), float(gamma) * np.asarray(T),
                               rtol=1e-6)


def test_recalibrate_gains_per_emitter_recovers_scales(rng):
    """Quantize get_tensor(diag(g)*S, C), hand the calibrator the
    unscaled factors: it must recover the per-emitter gains (which a
    single global gamma cannot when they differ)."""
    import quantized_spectrum_cartography_tpu.ops.boundaries as B
    from quantized_spectrum_cartography_tpu.ops.lowrank import get_tensor
    from quantized_spectrum_cartography_tpu.ops.metrics import nmse
    from quantized_spectrum_cartography_tpu.ops.quantizer import quantize_log
    from quantized_spectrum_cartography_tpu.solvers.calibrate import (
        recalibrate_gain,
        recalibrate_gains_per_emitter,
    )

    R, K, G = 2, 16, 21
    # spatially disjoint emitters so the two gains are identifiable
    S = np.zeros((R, G, G), np.float32)
    S[0, :10, :] = rng.uniform(0.001, 0.01, (10, G))
    S[1, 11:, :] = rng.uniform(0.001, 0.01, (10, G))
    S = jnp.asarray(S)
    C = jnp.asarray(rng.uniform(0.2, 1.0, (R, K)).astype(np.float32))
    g_true = jnp.asarray([0.3, 3.0])
    T_true = get_tensor(S * g_true[:, None, None], C)

    bb = jnp.asarray(np.array(B.QUANTIZATION_BOUNDARIES_16_ADJUSTED))
    offset, sigma = B.LOG_OFFSET_16_ADJUSTED, 0.3
    Y = quantize_log(jax.random.PRNGKey(0), T_true, sigma, bb, offset)

    gains, T_pe = recalibrate_gains_per_emitter(
        S, C, Y, bb, sigma, offset, steps=300)
    _, T_g = recalibrate_gain(get_tensor(S, C), Y, bb, sigma, offset)

    err_pe = float(nmse(T_pe, T_true))
    err_g = float(nmse(T_g, T_true))
    assert err_pe < err_g * 0.5       # per-emitter beats global
    assert err_pe < 0.1
    g = np.sort(np.asarray(gains))
    np.testing.assert_allclose(g, np.sort(np.asarray(g_true)), rtol=0.3)
