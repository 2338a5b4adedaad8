"""GAN-prior solver smoke + behavior tests (small shapes, few iters;
convergence-quality runs live in the benchmark harness)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_spectrum_cartography_tpu.config import QuantizerConfig, SolverConfig
from quantized_spectrum_cartography_tpu.ops import boundaries as B
from quantized_spectrum_cartography_tpu.ops.quantizer import quantize_log
from quantized_spectrum_cartography_tpu.models import Generator256
from quantized_spectrum_cartography_tpu.solvers import (
    init_z,
    make_generator_apply,
    randomized_search,
    recover_dip,
    recover_dowjons,
    recover_mle_gan,
    run_onebit_inversion,
)

QCFG = QuantizerConfig(
    boundaries=B.QUANTIZATION_BOUNDARIES_4_BINS_LOG,
    noise_std=5.0, domain="log", log_offset=B.LOG_OFFSET_4)


@pytest.fixture(scope="module")
def gen():
    g = Generator256()
    variables = g.init(jax.random.PRNGKey(0), jnp.zeros((1, 256)), train=False)
    return make_generator_apply(g, variables)


@pytest.fixture(scope="module")
def problem(gen):
    """Synthetic ground truth built FROM the generator so the prior is
    realizable (recovery must be able to drive the likelihood down)."""
    key = jax.random.PRNGKey(7)
    kz, kc, kq, km = jax.random.split(key, 4)
    Z_true = jax.random.normal(kz, (2, 256))
    S_true = gen(Z_true)                       # [2, 51, 51]
    C_true = jnp.abs(jax.random.normal(kc, (2, 64)))
    T_true = jnp.einsum("rij,rk->kij", S_true, C_true)
    Y = quantize_log(kq, T_true, QCFG.noise_std,
                     jnp.asarray(np.array(QCFG.boundaries)), QCFG.log_offset)
    mask = jax.random.bernoulli(km, 0.3, Y.shape).astype(jnp.float32)
    return T_true, Y, mask


def test_mle_gan_cost_decreases(gen, problem):
    T_true, Y, mask = problem
    scfg = SolverConfig(max_iters=8, z_search_global=8, z_search_local=8,
                        z_search_at_iter=1)
    res = recover_mle_gan(jax.random.PRNGKey(1), Y, mask, gen, scfg, QCFG,
                          T_true=T_true)
    costs = np.asarray(res.costs)
    assert costs.shape == (8,)
    assert np.all(np.isfinite(costs))
    assert costs[-1] < costs[0]
    assert res.T_hat.shape == T_true.shape
    assert np.all(np.asarray(res.C) >= 0)


def test_mle_gan_no_search_path(gen, problem):
    T_true, Y, mask = problem
    scfg = SolverConfig(max_iters=4, z_search_global=0, z_search_local=0)
    res = recover_mle_gan(jax.random.PRNGKey(1), Y, mask, gen, scfg, QCFG)
    assert np.asarray(res.costs).shape == (4,)
    assert np.all(np.isfinite(np.asarray(res.costs)))


def test_dowjons_cost_decreases(gen, problem):
    T_true, Y, mask = problem
    qc = QuantizerConfig(
        boundaries=B.QUANTIZATION_BOUNDARIES_7_ADJUSTED,
        noise_std=3.0, log_offset=B.LOG_OFFSET_7_ADJUSTED)
    Y7 = quantize_log(jax.random.PRNGKey(2), T_true, qc.noise_std,
                      jnp.asarray(np.array(qc.boundaries)), qc.log_offset)
    scfg = SolverConfig(max_iters=8)
    res = recover_dowjons(jax.random.PRNGKey(1), Y7, mask, gen, scfg, qc,
                          T_true=T_true)
    costs = np.asarray(res.costs)
    assert np.all(np.isfinite(costs))
    assert costs[-1] < costs[0]


def test_randomized_search_picks_best(gen):
    """Search must return a candidate no worse than the start."""
    target = gen(jax.random.normal(jax.random.PRNGKey(3), (1, 256)))

    def crit(S):
        return jnp.mean(jnp.square(S - target))

    z0 = jnp.zeros((1, 256))
    z = randomized_search(jax.random.PRNGKey(4), gen, crit, z0, 16, 16)
    assert float(crit(gen(z))) <= float(crit(gen(z0))) + 1e-6


def test_init_z_improves_mse(gen):
    target = gen(jax.random.normal(jax.random.PRNGKey(5), (1, 256)))[0]
    z = init_z(jax.random.PRNGKey(6), gen, target,
               num_global=8, num_local=8, adam_steps=10)
    z0 = jnp.zeros((1, 256))
    mse = lambda zz: float(jnp.mean(jnp.square(gen(zz)[0] - target)))
    assert mse(z) < mse(z0)


def test_onebit_inversion_runs(gen):
    S_true = gen(jax.random.normal(jax.random.PRNGKey(8), (1, 256)))[0]
    mean = 0.3
    y01 = (S_true > mean).astype(jnp.float32)
    S_hat, z, losses = run_onebit_inversion(
        jax.random.PRNGKey(9), gen, y01, mean, loss_criterion="bce",
        num_global=8, num_local=8, adam_steps=10)
    assert S_hat.shape == S_true.shape
    assert np.all(np.isfinite(np.asarray(losses)))
    # balevi variant with +-1 targets
    ypm = jnp.where(S_true > mean, 1.0, -1.0)
    S_hat2, _, losses2 = run_onebit_inversion(
        jax.random.PRNGKey(10), gen, ypm, mean, loss_criterion="balevi",
        num_global=4, num_local=4, adam_steps=5)
    assert np.all(np.isfinite(np.asarray(losses2)))


def test_dip_recovery_smoke():
    key = jax.random.PRNGKey(0)
    S_true = jax.random.uniform(key, (51, 51))
    mean = 0.5
    y01 = (S_true > mean).astype(jnp.float32)
    S_hat, losses, _ = recover_dip(
        jax.random.PRNGKey(1), y01, mask=None, mean=mean, std=0.1,
        onebit=True, steps=5)
    assert S_hat.shape == (51, 51)
    assert np.all(np.isfinite(np.asarray(losses)))


def test_dip_tensor_recovery_mechanics():
    """Full-tensor DIP (R decoder instances + free C): shapes, finite
    losses, and the likelihood decreasing over the run."""
    from quantized_spectrum_cartography_tpu.solvers import recover_dip_tensor

    key = jax.random.PRNGKey(0)
    K, I = 8, 51
    S_true = jax.random.uniform(jax.random.PRNGKey(1), (2, I, I)) * 0.1
    C_true = jax.random.uniform(jax.random.PRNGKey(2), (2, K))
    T_true = jnp.einsum("rij,rk->kij", S_true, C_true)
    mean = 0.01
    y01 = (T_true > mean).astype(jnp.float32)
    S_hat, C_hat, losses, _, aux = recover_dip_tensor(
        key, y01, mean=mean, std=0.05, num_emitters=2, steps=30,
        T_true=T_true)
    assert S_hat.shape == (2, I, I) and C_hat.shape == (2, K)
    losses = np.asarray(losses)
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    assert np.all(np.asarray(C_hat) >= 0.0)
    # the held-out restart-selection score is finite and populated
    assert np.isfinite(float(aux["holdout_best"]))
    assert np.isfinite(float(aux["final_fit"]))


def test_dip_output_ema_tracks_reconstruction():
    """out_ema_decay > 0 returns a T_ema aux whose fit is comparable to
    (or smoother than) the final iterate — the round-5 DIP stabilizer
    for the measured flat-validation-NLL regime."""
    from quantized_spectrum_cartography_tpu.solvers import recover_dip_tensor

    key = jax.random.PRNGKey(0)
    K, I = 8, 51
    S_true = jax.random.uniform(jax.random.PRNGKey(1), (2, I, I)) * 0.1
    C_true = jax.random.uniform(jax.random.PRNGKey(2), (2, K))
    T_true = jnp.einsum("rij,rk->kij", S_true, C_true)
    mean = 0.01
    y01 = (T_true > mean).astype(jnp.float32)
    S_hat, C_hat, losses, _, aux = recover_dip_tensor(
        key, y01, mean=mean, std=0.05, num_emitters=2, steps=40,
        T_true=T_true, out_ema_decay=0.9)
    assert "T_ema" in aux
    T_ema = np.asarray(aux["T_ema"])
    assert T_ema.shape == y01.shape
    assert np.all(np.isfinite(T_ema))
    # the EMA is a convex combination of trajectory reconstructions, so
    # it stays in the same value range as the raw output
    T_fin = np.asarray(jnp.einsum("rij,rk->kij", S_hat, C_hat))
    assert T_ema.max() <= max(T_fin.max() * 3.0, 1.0)
