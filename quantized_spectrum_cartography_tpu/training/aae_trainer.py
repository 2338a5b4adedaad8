"""Adversarial-autoencoder training loop.

Completes the reference's truncated AAE `train_step`
(`deep_prior/networks/aae.py:222-237`, dead code — SURVEY.md §2.3) as a
working jitted pipeline: per step,
  1. AE update:      min_{E,D}  ||x - D(E(x))||^2
  2. latent D update: max_Dz     log Dz(z~N(0,I)) + log(1 - Dz(E(x)))
  3. encoder update:  min_E     -log Dz(E(x))      (fool the critic)
all fused into one XLA program over on-device simulator batches, like
training/gan_trainer.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from quantized_spectrum_cartography_tpu.config import PhysicsConfig
from quantized_spectrum_cartography_tpu.data.datasets import make_slf_sampler
from quantized_spectrum_cartography_tpu.models.aae import (
    AAEDecoder,
    AAEEncoder,
    LatentDiscriminator,
)
from quantized_spectrum_cartography_tpu.training.checkpoints import (
    save_checkpoint,
)


@dataclasses.dataclass(frozen=True)
class AAETrainConfig:
    z_dim: int = 64
    batch_size: int = 64
    lr_ae: float = 1e-3
    lr_adv: float = 5e-4
    steps: int = 10000
    scale: float = 2.5        # amplitude match, like gan_trainer.scale
    adv_weight: float = 0.1   # encoder's fooling term vs reconstruction


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AAEState:
    enc: Any
    dec: Any
    dz: Any
    enc_stats: Any
    dec_stats: Any
    opt_ae: Any
    opt_dz: Any
    opt_gen: Any
    step: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.int32(0))


def _bce(p: jnp.ndarray, target: float) -> jnp.ndarray:
    p = jnp.clip(p, 1e-6, 1.0 - 1e-6)
    return -jnp.mean(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))


def init_aae(key: jax.Array, cfg: AAETrainConfig):
    enc = AAEEncoder(z_dim=cfg.z_dim)
    dec = AAEDecoder(z_dim=cfg.z_dim)
    dz = LatentDiscriminator()
    ke, kd, kz = jax.random.split(key, 3)
    ev = enc.init(ke, jnp.zeros((1, 51, 51, 1)), train=True)
    dv = dec.init(kd, jnp.zeros((1, cfg.z_dim)), train=True)
    zv = dz.init(kz, jnp.zeros((1, cfg.z_dim)))
    opt_ae = optax.adam(cfg.lr_ae)
    opt_dz = optax.adam(cfg.lr_adv)
    opt_gen = optax.adam(cfg.lr_adv)
    state = AAEState(
        enc=ev["params"], dec=dv["params"], dz=zv["params"],
        enc_stats=ev.get("batch_stats", {}),
        dec_stats=dv.get("batch_stats", {}),
        opt_ae=opt_ae.init((ev["params"], dv["params"])),
        opt_dz=opt_dz.init(zv["params"]),
        opt_gen=opt_gen.init(ev["params"]))
    return enc, dec, dz, (opt_ae, opt_dz, opt_gen), state


def make_aae_step(enc, dec, dz, opts, cfg: AAETrainConfig,
                  physics: PhysicsConfig = PhysicsConfig()):
    opt_ae, opt_dz, opt_gen = opts
    sampler = make_slf_sampler(physics)

    def apply_enc(params, stats, x, train):
        out, updates = enc.apply(
            {"params": params, "batch_stats": stats}, x, train=train,
            mutable=["batch_stats"] if train else [])
        return out, (updates.get("batch_stats", stats) if train else stats)

    def apply_dec(params, stats, z, train):
        out, updates = dec.apply(
            {"params": params, "batch_stats": stats}, z, train=train,
            mutable=["batch_stats"] if train else [])
        return out, (updates.get("batch_stats", stats) if train else stats)

    @jax.jit
    def step(state: AAEState, key: jax.Array):
        k_data, k_prior = jax.random.split(jax.random.fold_in(key, state.step))
        x = sampler(k_data, cfg.batch_size)[..., None] * cfg.scale

        # 1. reconstruction update of (E, D)
        def recon_loss(ed):
            ep, dp = ed
            z, es = apply_enc(ep, state.enc_stats, x, True)
            xh, ds = apply_dec(dp, state.dec_stats, z, True)
            return jnp.mean(jnp.square(xh - x)), (es, ds)

        (rl, (es, ds)), g = jax.value_and_grad(recon_loss, has_aux=True)(
            (state.enc, state.dec))
        upd, opt_ae_s = opt_ae.update(g, state.opt_ae, (state.enc, state.dec))
        enc_p, dec_p = optax.apply_updates((state.enc, state.dec), upd)

        # 2. latent discriminator: real prior z vs encoder z
        z_fake, _ = apply_enc(enc_p, es, x, False)
        z_real = jax.random.normal(k_prior, z_fake.shape)

        def dz_loss(zp):
            return (_bce(dz.apply({"params": zp}, z_real), 1.0)
                    + _bce(dz.apply({"params": zp}, z_fake), 0.0))

        dl, gz = jax.value_and_grad(dz_loss)(state.dz)
        upd_z, opt_dz_s = opt_dz.update(gz, state.opt_dz, state.dz)
        dz_p = optax.apply_updates(state.dz, upd_z)

        # 3. encoder fools the critic (regularization toward the prior)
        def gen_loss(ep):
            z, _ = apply_enc(ep, es, x, False)
            return cfg.adv_weight * _bce(dz.apply({"params": dz_p}, z), 1.0)

        gl, gg = jax.value_and_grad(gen_loss)(enc_p)
        upd_g, opt_gen_s = opt_gen.update(gg, state.opt_gen, enc_p)
        enc_p = optax.apply_updates(enc_p, upd_g)

        new = AAEState(enc=enc_p, dec=dec_p, dz=dz_p,
                       enc_stats=es, dec_stats=ds,
                       opt_ae=opt_ae_s, opt_dz=opt_dz_s, opt_gen=opt_gen_s,
                       step=state.step + 1)
        return new, {"recon": rl, "dz": dl, "gen": gl}

    return step


def train_aae(
    key: jax.Array,
    cfg: AAETrainConfig = AAETrainConfig(),
    physics: PhysicsConfig = PhysicsConfig(),
    checkpoint_dir: Optional[str] = None,
    log_every: int = 500,
    log_fn=print,
) -> Tuple[Any, Any, AAEState, Dict[str, float]]:
    """Returns (decoder_module, encoder_module, state, last_metrics).

    The trained decoder is a generative prior usable by the GAN-inversion
    and MLE solvers (sample/optimize z ~ N(0, I)); the encoder gives
    amortized latent initialization like solvers/vae_prior.py.
    """
    k0, key = jax.random.split(key)
    enc, dec, dz, opts, state = init_aae(k0, cfg)
    step = make_aae_step(enc, dec, dz, opts, cfg, physics)
    metrics = {}
    for i in range(cfg.steps):
        state, metrics = step(state, key)
        if log_every and (i % log_every == 0 or i == cfg.steps - 1):
            log_fn(f"aae step {i}: recon {float(metrics['recon']):.5f} "
                   f"dz {float(metrics['dz']):.4f} "
                   f"gen {float(metrics['gen']):.4f}")
    if checkpoint_dir:
        save_checkpoint(checkpoint_dir, {
            "enc": state.enc, "dec": state.dec, "dz": state.dz,
            "enc_stats": state.enc_stats, "dec_stats": state.dec_stats,
            "config": dataclasses.asdict(cfg)})
    return dec, enc, state, {k: float(v) for k, v in metrics.items()}
