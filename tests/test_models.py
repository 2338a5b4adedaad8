"""Model architecture checks: output shapes/ranges, BN mutability,
spectral-norm contraction, VAE loss parts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_spectrum_cartography_tpu.models import (
    Autoencoder,
    DecoderDip,
    Discriminator,
    Generator64,
    Generator128,
    Generator256,
    Generator512,
    SNDiscriminator,
    VAE,
    total_variation_loss,
)
from quantized_spectrum_cartography_tpu.models.spectral_norm import power_iteration


@pytest.mark.parametrize("maker,zdim", [
    (Generator256, 256), (Generator128, 128),
    (Generator512, 512), (Generator64, 64),
])
def test_generator_output_shape(maker, zdim):
    g = maker()
    z = jnp.zeros((2, zdim))
    vars_ = g.init(jax.random.PRNGKey(0), z, train=False)
    out = g.apply(vars_, z, train=False)
    assert out.shape == (2, 51, 51, 1)
    o = np.asarray(out)
    assert o.min() >= 0.0 and o.max() <= 1.0


def test_generator_train_updates_batch_stats():
    g = Generator256()
    z = jax.random.normal(jax.random.PRNGKey(1), (4, 256))
    vars_ = g.init(jax.random.PRNGKey(0), z, train=True)
    out, mut = g.apply(vars_, z, train=True, mutable=["batch_stats"])
    assert out.shape == (4, 51, 51, 1)
    leaves = jax.tree_util.tree_leaves(mut["batch_stats"])
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)


def test_dip_decoder_shape():
    d = DecoderDip()
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 256))
    vars_ = d.init(jax.random.PRNGKey(0), z, train=False)
    out = d.apply(vars_, z, train=False)
    assert out.shape == (1, 51, 51, 1)


def test_autoencoder_completion_shape():
    ae = Autoencoder()
    x = jnp.zeros((3, 51, 51, 2))   # mask || masked map channels
    vars_ = ae.init(jax.random.PRNGKey(0), x, train=False)
    out = ae.apply(vars_, x, train=False)
    assert out.shape == (3, 51, 51, 1)


@pytest.mark.parametrize("maker", [Discriminator, SNDiscriminator])
def test_discriminator_shape(maker):
    d = maker()
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 51, 51, 1))
    vars_ = d.init(jax.random.PRNGKey(0), x, train=False)
    out = d.apply(vars_, x, train=False)
    assert out.shape == (2, 1)
    o = np.asarray(out)
    assert (o >= 0).all() and (o <= 1).all()


def test_power_iteration_estimates_sigma_max():
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.normal(size=(32, 64)).astype(np.float32))
    u = jnp.asarray(rng.normal(size=(1, 32)).astype(np.float32))
    sigma, u = power_iteration(W, u, steps=200)
    true = np.linalg.svd(np.asarray(W), compute_uv=False)[0]
    # convergence rate depends on the sigma1/sigma2 gap; 0.5% is plenty for SN
    assert abs(float(sigma) - true) / true < 5e-3


def test_vae_forward_and_loss():
    v = VAE(latent_dim=16)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 51, 51, 2))
    target = jax.random.uniform(jax.random.PRNGKey(1), (2, 51, 51, 1))
    vars_ = v.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(2), train=False)
    recon, mean, logstd = v.apply(vars_, x, jax.random.PRNGKey(3), train=False)
    assert recon.shape == (2, 51, 51, 1)
    total, bce, kl = v.apply(
        vars_, recon, target, mean, logstd, method=VAE.loss)
    assert np.isfinite(float(total)) and float(kl) >= 0


def test_tv_loss_zero_for_constant():
    img = jnp.ones((1, 8, 8, 1))
    assert float(total_variation_loss(img)) == 0.0
