"""Prior-training smoke tests (few steps, small batches, CPU) + dataset
pipeline checks + checkpoint round-trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from quantized_spectrum_cartography_tpu.config import PhysicsConfig
from quantized_spectrum_cartography_tpu.data.datasets import (
    SLFBatchConfig,
    gan_sample_batch,
    make_slf_sampler,
    mask_batch,
)
from quantized_spectrum_cartography_tpu.training import (
    AETrainConfig,
    GANTrainConfig,
    VAETrainConfig,
    load_checkpoint,
    make_ae_completer,
    save_checkpoint,
    train_ae,
    train_gan,
    train_vae,
)

SMALL_PHYS = PhysicsConfig(grid_size=51, decorrelation_distance=30.0)


def test_slf_sampler_batch():
    sampler = make_slf_sampler(SMALL_PHYS)
    S = sampler(jax.random.PRNGKey(0), 4)
    assert S.shape == (4, 51, 51)
    norms = np.linalg.norm(np.asarray(S).reshape(4, -1), axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)


def test_mask_batch_shapes_and_onebit():
    maps = jax.random.uniform(jax.random.PRNGKey(0), (3, 51, 51)) * 0.01
    cfg = SLFBatchConfig(batch_size=3, onebit=True, mean_slf=0.005)
    inp, target = mask_batch(jax.random.PRNGKey(1), maps, cfg)
    assert inp.shape == (3, 51, 51, 2)
    assert target.shape == (3, 51, 51, 1)
    mask = np.asarray(inp[..., 0])
    assert set(np.unique(mask)).issubset({0.0, 1.0})
    src = np.asarray(inp[..., 1])
    assert set(np.unique(src)).issubset({-1.0, 0.0, 1.0})


def test_gan_training_steps_produce_finite_losses():
    cfg = GANTrainConfig(steps=3, batch_size=4, z_dim=64)
    variables, diag = train_gan(
        jax.random.PRNGKey(0), cfg, SMALL_PHYS, log_every=1,
        log_fn=lambda *a: None)
    assert "params" in variables and "batch_stats" in variables
    # generator still produces valid maps after updates
    from quantized_spectrum_cartography_tpu.models import make_generator
    g = make_generator(64)
    out = g.apply(variables, jnp.zeros((2, 64)), train=False)
    assert out.shape == (2, 51, 51, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_ae_training_reduces_loss():
    cfg = AETrainConfig(steps=30, batch_size=8)
    variables, diag = train_ae(
        jax.random.PRNGKey(0), cfg, SMALL_PHYS, log_every=10,
        log_fn=lambda *a: None)
    losses = [m[1] for m in diag["metrics"]]
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 1.5  # no blow-up over 30 steps
    # completer wrapper
    from quantized_spectrum_cartography_tpu.models import Autoencoder
    model = Autoencoder()
    complete = make_ae_completer(model, variables, diag["scale"])
    mask = jnp.ones((51, 51))
    obs = jax.random.uniform(jax.random.PRNGKey(1), (51, 51)) * 0.01
    out = complete(mask, obs)
    assert out.shape == (51, 51)


def test_vae_training_steps():
    cfg = VAETrainConfig(steps=3, batch_size=4, latent_dim=8)
    variables, diag = train_vae(
        jax.random.PRNGKey(0), cfg, SMALL_PHYS, log_every=1,
        log_fn=lambda *a: None)
    totals = [m[1] for m in diag["metrics"]]
    assert np.all(np.isfinite(totals))


def test_vae_ema_and_heldout_elbo():
    """EMA weights track params (decay-weighted) and the held-out ELBO
    criterion returns finite terms for both raw and EMA variables."""
    from quantized_spectrum_cartography_tpu.training import heldout_elbo

    cfg = VAETrainConfig(steps=4, batch_size=4, latent_dim=8,
                         ema_decay=0.5)
    variables, diag = train_vae(
        jax.random.PRNGKey(0), cfg, SMALL_PHYS, log_every=1,
        log_fn=lambda *a: None)
    assert "variables_ema" in diag
    # EMA must differ from raw params (decay < 1, steps > 0) but share
    # the tree structure
    raw_leaves = jax.tree.leaves(variables["params"])
    ema_leaves = jax.tree.leaves(diag["variables_ema"]["params"])
    assert len(raw_leaves) == len(ema_leaves)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(raw_leaves, ema_leaves))
    for v in (variables, diag["variables_ema"]):
        crit = heldout_elbo(cfg, v, SMALL_PHYS, batches=2)
        assert np.isfinite(crit["elbo_loss"])
        assert crit["elbo_loss"] == crit["bce"] + cfg.beta * crit["kl"]


def test_gan_sample_batch():
    gen = lambda z: jnp.zeros((z.shape[0], 51, 51)) + z[:, :1, None]
    s, z = gan_sample_batch(jax.random.PRNGKey(0), gen, 5, z_dim=16)
    assert s.shape == (5, 51, 51) and z.shape == (5, 16)


def test_checkpoint_roundtrip(tmp_path):
    state = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))}
    p = os.path.join(str(tmp_path), "ckpt")
    save_checkpoint(p, state)
    restored = load_checkpoint(p, target=state)
    np.testing.assert_allclose(np.asarray(restored["w"]),
                               np.asarray(state["w"]))
    np.testing.assert_allclose(np.asarray(restored["b"]),
                               np.asarray(state["b"]))


def test_aae_trainer_steps_and_prior_shape():
    """Working AAE (the reference's aae.py is dead code): a few training
    steps must run, losses finite and reconstruction decreasing-ish, and
    the trained decoder must act as a z ~ N(0,I) generative prior."""
    import jax
    import jax.numpy as jnp

    from quantized_spectrum_cartography_tpu.training.aae_trainer import (
        AAETrainConfig,
        init_aae,
        make_aae_step,
    )

    cfg = AAETrainConfig(z_dim=16, batch_size=4, steps=3)
    enc, dec, dz, opts, state = init_aae(jax.random.PRNGKey(0), cfg)
    step = make_aae_step(enc, dec, dz, opts, cfg)
    key = jax.random.PRNGKey(1)
    first = None
    for _ in range(3):
        state, m = step(state, key)
        assert all(np.isfinite(float(v)) for v in m.values()), m
        if first is None:
            first = float(m["recon"])
    # decoder as prior: z -> [B, 51, 51, 1] in [0, 1]
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 16))
    out = dec.apply({"params": state.dec, "batch_stats": state.dec_stats},
                    z, train=False)
    assert out.shape == (2, 51, 51, 1)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
