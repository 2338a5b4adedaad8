"""VAE / betaVAE training loop.

Replaces the reference's pytorch-lightning scaffolding
(`deep_prior/networks/vae.py:199-286`: configure_optimizers with
Adam+StepLR, training/test steps, loaders) with a jitted step over
simulator batches.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from quantized_spectrum_cartography_tpu.config import PhysicsConfig
from quantized_spectrum_cartography_tpu.data.datasets import (
    SLFBatchConfig,
    make_slf_sampler,
    mask_batch,
)
from quantized_spectrum_cartography_tpu.models import VAE
from quantized_spectrum_cartography_tpu.training.checkpoints import save_checkpoint


@dataclasses.dataclass(frozen=True)
class VAETrainConfig:
    latent_dim: int = 64
    beta: float = 1.0
    batch_size: int = 64
    lr: float = 1e-3
    lr_decay_steps: int = 2000   # StepLR equivalent (vae.py:205-208)
    lr_decay_rate: float = 0.5
    steps: int = 10000
    scale: float = 50.0
    kl_warmup_steps: int = 3000   # anneal the KL weight 0 -> beta: without
                                  # it most seeds posterior-collapse (decoder
                                  # ignores z and emits the mean map)
    free_bits: float = 0.1        # per-latent-dim KL floor (nats): dims whose
                                  # batch-mean KL is below the floor stop
                                  # contributing gradient toward 0, which
                                  # removes the posterior-collapse attractor
                                  # warm-up alone does not (round-1 RESULTS.md:
                                  # ~1 in 3 seeds collapsed).  0 disables.
                                  # 0.1 measured to also lift bad-init seeds
                                  # out of the decoder-mean BCE plateau by
                                  # ~20k steps (VAE_FREEBITS.json); 0.05 only
                                  # prevented KL->0, not the plateau.
    ema_decay: float = 0.0        # exponential moving average of params
                                  # (0 disables).  EMA weights average out
                                  # late-training noise — the round-2
                                  # residual seed variance mechanism —
                                  # and are returned as variables_ema.
    peak_weight: float = 0.0      # reconstruction weight 1 + pw*target
                                  # (targets are peak-normalized, so the
                                  # peak pixel gets (1+pw)x weight).  The
                                  # decoder's peak-amplitude ceiling
                                  # (dense z-fit ratio ~0.71 unweighted,
                                  # tools/vae_peak_diag.py) bounds every
                                  # inversion-based recovery's detection
                                  # fidelity; plain BCE underweights the
                                  # handful of peak pixels.  0 disables.
    head: str = "sigmoid"         # decoder output head (models/ae.Decoder)
    dec_width: int = 16           # decoder channel-width multiplier base
    refine_width: int = 0         # full-resolution refinement block width
    recon: str = "bce"            # data term: 'bce' (reference, vae.py:
                                  # 345-370; requires sigmoid head) or
                                  # 'mse' (works with any head — the
                                  # round-4 non-saturating-head fix for
                                  # the peak-amplitude ceiling)


def train_vae(
    key: jax.Array,
    cfg: VAETrainConfig = VAETrainConfig(),
    physics: PhysicsConfig = PhysicsConfig(),
    checkpoint_dir: Optional[str] = None,
    log_every: int = 200,
    log_fn=print,
) -> Tuple[Any, Dict[str, Any]]:
    model = VAE(latent_dim=cfg.latent_dim, beta=cfg.beta, head=cfg.head,
                dec_width=cfg.dec_width, refine_width=cfg.refine_width)
    k0, key = jax.random.split(key)
    variables = model.init(k0, jnp.zeros((1, 51, 51, 2)),
                           jax.random.PRNGKey(0), train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]

    sched = optax.exponential_decay(
        cfg.lr, cfg.lr_decay_steps, cfg.lr_decay_rate, staircase=True)
    opt = optax.adam(sched)
    opt_state = opt.init(params)

    sampler = make_slf_sampler(physics)
    bcfg = SLFBatchConfig(batch_size=cfg.batch_size, normalize_peak=True)

    def loss_fn(params, batch_stats, inp, target, k, kl_w):
        (recon, mean, logstd), mut = model.apply(
            {"params": params, "batch_stats": batch_stats}, inp, k,
            train=True, mutable=["batch_stats"])
        _, bce, kl = model.loss(recon, target, mean, logstd)
        w = 1.0 + cfg.peak_weight * target
        if cfg.recon == "mse":
            # MSE data term — the only valid choice for non-sigmoid heads
            # (outputs leave [0,1]); summed over pixels like the BCE so
            # the KL balance stays in the same regime.  `bce` is still
            # logged (clipped) for cross-run comparability.
            bce_obj = jnp.sum(w * jnp.square(recon - target)) / \
                recon.shape[0]
        elif cfg.peak_weight > 0.0:
            # weighted BCE replaces the data term in the objective; the
            # logged `bce` stays unweighted for cross-run comparability
            eps = 1e-7
            r = jnp.clip(recon, eps, 1.0 - eps)
            bce_obj = -jnp.sum(
                w * (target * jnp.log(r)
                     + (1.0 - target) * jnp.log(1.0 - r))
            ) / recon.shape[0]
        else:
            bce_obj = bce
        if cfg.free_bits > 0.0:
            # free-bits objective: per-dim batch-mean KL floored at the
            # free-bits level, so near-collapsed dims get zero gradient
            # toward further collapse (the raw `kl` is still what we log)
            kl_dims = 0.5 * jnp.mean(
                jnp.square(mean) + jnp.exp(2.0 * logstd)
                - 2.0 * logstd - 1.0, axis=0)
            kl_obj = jnp.sum(jnp.maximum(kl_dims, cfg.free_bits))
        else:
            kl_obj = kl
        total = bce_obj + kl_w * cfg.beta * kl_obj
        return total, (mut["batch_stats"], bce, kl)

    @jax.jit
    def step(params, ema, batch_stats, opt_state, k, i):
        k1, k2, k3 = jax.random.split(k, 3)
        maps = sampler(k1, cfg.batch_size)
        inp, target = mask_batch(k2, maps, bcfg)
        kl_w = jnp.clip(i / jnp.maximum(cfg.kl_warmup_steps, 1), 0.0, 1.0)
        (total, (batch_stats, bce, kl)), g = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, inp, target, k3,
                                   kl_w)
        up, opt_state = opt.update(g, opt_state, params)
        params = optax.apply_updates(params, up)
        if cfg.ema_decay > 0.0:
            d = cfg.ema_decay
            ema = jax.tree.map(lambda e, p: d * e + (1.0 - d) * p,
                               ema, params)
        return params, ema, batch_stats, opt_state, total, bce, kl

    ema = params
    hist = []
    for i in range(cfg.steps):
        key, k = jax.random.split(key)
        params, ema, batch_stats, opt_state, total, bce, kl = step(
            params, ema, batch_stats, opt_state, k, jnp.float32(i))
        if (i + 1) % log_every == 0:
            hist.append((i + 1, float(total), float(bce), float(kl)))
            log_fn(f"vae step {i+1}: loss {float(total):.4f} "
                   f"bce {float(bce):.4f} kl {float(kl):.4f}")
    variables = {"params": params, "batch_stats": batch_stats}
    if checkpoint_dir:
        save_checkpoint(f"{checkpoint_dir}/final", variables)
    info: Dict[str, Any] = {"metrics": hist}
    if cfg.ema_decay > 0.0:
        info["variables_ema"] = {"params": ema, "batch_stats": batch_stats}
    return variables, info


def heldout_elbo(
    cfg: VAETrainConfig,
    variables,
    physics: PhysicsConfig = PhysicsConfig(),
    key: Optional[jax.Array] = None,
    batches: int = 8,
) -> Dict[str, float]:
    """Held-out ELBO terms on fresh simulator draws — a TRAINING-TIME
    model-quality criterion (same objective as training, fixed keys, no
    downstream recovery probe) usable for principled checkpoint selection
    across seeds: plateaued/collapsed seeds show high BCE / near-zero KL.
    """
    if key is None:
        key = jax.random.PRNGKey(987_654)
    model = VAE(latent_dim=cfg.latent_dim, beta=cfg.beta, head=cfg.head,
                dec_width=cfg.dec_width, refine_width=cfg.refine_width)
    sampler = make_slf_sampler(physics)
    bcfg = SLFBatchConfig(batch_size=cfg.batch_size, normalize_peak=True)

    @jax.jit
    def eval_batch(k):
        k1, k2, k3 = jax.random.split(k, 3)
        maps = sampler(k1, cfg.batch_size)
        inp, target = mask_batch(k2, maps, bcfg)
        recon, mean, logstd = model.apply(variables, inp, k3, train=False)
        _, bce, kl = model.loss(recon, target, mean, logstd)
        return bce, kl

    bces, kls = [], []
    for i in range(batches):
        b, k_ = eval_batch(jax.random.fold_in(key, i))
        bces.append(float(b))
        kls.append(float(k_))
    bce, kl = float(jnp.mean(jnp.asarray(bces))), float(
        jnp.mean(jnp.asarray(kls)))
    return {"bce": bce, "kl": kl, "elbo_loss": bce + cfg.beta * kl}
