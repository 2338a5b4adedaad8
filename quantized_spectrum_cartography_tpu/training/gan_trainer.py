"""SNGAN training for the SLF deep prior.

The reference *uses* an SNGAN-trained Generator256 everywhere
(`sngan11_256_unnorm`, qmc/qmc_utils.py:22-33) but its training script is
not in the repo (checkpoints stripped, .MISSING_LARGE_BLOBS) — so this
pipeline is a required rebuild (SURVEY.md section 3.5): DCGAN BCE loss
with a spectrally normalized discriminator, trained on simulator SLFs.

TPU design: one fused jitted train step (D update + G update), batch data
generated on-device from the physics simulator (no host data loading),
data-parallel over a mesh via sharding annotations in parallel/.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from quantized_spectrum_cartography_tpu.config import PhysicsConfig
from quantized_spectrum_cartography_tpu.data.datasets import make_slf_sampler
from quantized_spectrum_cartography_tpu.models import Discriminator, make_generator
from quantized_spectrum_cartography_tpu.training.checkpoints import save_checkpoint


@dataclasses.dataclass(frozen=True)
class GANTrainConfig:
    z_dim: int = 256
    batch_size: int = 64
    lr_g: float = 2e-4
    lr_d: float = 1e-4           # D below G: with amplitude-matched data
                                 # the D otherwise wins early and G stalls
    beta1: float = 0.5           # DCGAN convention
    steps: int = 20000
    spectral_norm: bool = True
    scale: float = 2.5           # SLF peak ~0.26 (p99 0.31); x2.5 fills the
                                 # sigmoid range without clipping; divided
                                 # back out at inference
    real_label: float = 0.9      # one-sided label smoothing
    loss: str = "bce"            # 'bce' (reference DCGAN recipe) or 'hinge'
                                 # (the standard SNGAN objective: D on raw
                                 # scores, relu(1 -/+ score); pair with TTUR
                                 # lr_d > lr_g)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GANState:
    g_params: Any
    g_batch_stats: Any
    d_params: Any
    d_batch_stats: Any
    d_spectral: Any
    g_opt: Any
    d_opt: Any
    step: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.int32(0))


def init_gan(key: jax.Array, cfg: GANTrainConfig):
    g = make_generator(cfg.z_dim)
    d = Discriminator(spectral_norm=cfg.spectral_norm,
                      output_logits=(cfg.loss == "hinge"))
    kg, kd = jax.random.split(key)
    gv = g.init(kg, jnp.zeros((1, cfg.z_dim)), train=True)
    dv = d.init(kd, jnp.zeros((1, 51, 51, 1)), train=True)
    opt_g = optax.adam(cfg.lr_g, b1=cfg.beta1)
    opt_d = optax.adam(cfg.lr_d, b1=cfg.beta1)
    state = GANState(
        g_params=gv["params"], g_batch_stats=gv["batch_stats"],
        d_params=dv["params"], d_batch_stats=dv.get("batch_stats", {}),
        d_spectral=dv.get("spectral_stats", {}),
        g_opt=opt_g.init(gv["params"]), d_opt=opt_d.init(dv["params"]))
    return g, d, opt_g, opt_d, state


def _bce(logits_p: jnp.ndarray, target: float) -> jnp.ndarray:
    """BCE on sigmoid outputs p in (0,1) against a constant target."""
    p = jnp.clip(logits_p, 1e-6, 1.0 - 1e-6)
    return -jnp.mean(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))


def make_train_step(
    g, d, opt_g, opt_d, cfg: GANTrainConfig,
    sampler: Callable[[jax.Array, int], jnp.ndarray],
):
    """One fused D+G update, jittable; returns (state, metrics)."""

    def step(state: GANState, key: jax.Array):
        k_data, k_z1, k_z2 = jax.random.split(key, 3)
        real = sampler(k_data, cfg.batch_size) * cfg.scale   # [B, I, J]
        real = real[..., None]

        def g_forward(g_params, g_bs, z):
            out, mut = g.apply(
                {"params": g_params, "batch_stats": g_bs}, z, train=True,
                mutable=["batch_stats"])
            return out, mut["batch_stats"]

        def d_forward(d_params, d_bs, d_sp, x, update_sn):
            variables = {"params": d_params, "batch_stats": d_bs,
                         "spectral_stats": d_sp}
            out, mut = d.apply(
                variables, x, train=True,
                mutable=["batch_stats", "spectral_stats"] if update_sn
                else ["batch_stats"])
            return out, mut

        # --- D step ---
        z = jax.random.normal(k_z1, (cfg.batch_size, cfg.z_dim))
        fake, g_bs = g_forward(state.g_params, state.g_batch_stats, z)

        def d_loss_fn(d_params):
            p_real, mut = d_forward(d_params, state.d_batch_stats,
                                    state.d_spectral, real, True)
            p_fake, _ = d_forward(d_params, mut.get("batch_stats", state.d_batch_stats),
                                  mut.get("spectral_stats", state.d_spectral),
                                  jax.lax.stop_gradient(fake), False)
            if cfg.loss == "hinge":
                loss = (jnp.mean(jax.nn.relu(1.0 - p_real))
                        + jnp.mean(jax.nn.relu(1.0 + p_fake)))
            else:
                loss = _bce(p_real, cfg.real_label) + _bce(p_fake, 0.0)
            return loss, mut

        (d_loss, d_mut), d_grad = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params)
        d_up, d_opt = opt_d.update(d_grad, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_up)
        d_bs = d_mut.get("batch_stats", state.d_batch_stats)
        d_sp = d_mut.get("spectral_stats", state.d_spectral)

        # --- G step ---
        z2 = jax.random.normal(k_z2, (cfg.batch_size, cfg.z_dim))

        def g_loss_fn(g_params):
            fake2, g_bs2 = g_forward(g_params, g_bs, z2)
            p_fake, _ = d_forward(d_params, d_bs, d_sp, fake2, False)
            if cfg.loss == "hinge":
                return -jnp.mean(p_fake), g_bs2
            return _bce(p_fake, 1.0), g_bs2

        (g_loss, g_bs_new), g_grad = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params)
        g_up, g_opt = opt_g.update(g_grad, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_up)

        new_state = GANState(
            g_params=g_params, g_batch_stats=g_bs_new,
            d_params=d_params, d_batch_stats=d_bs, d_spectral=d_sp,
            g_opt=g_opt, d_opt=d_opt, step=state.step + 1)
        return new_state, {"d_loss": d_loss, "g_loss": g_loss}

    return step


def train_gan(
    key: jax.Array,
    cfg: GANTrainConfig = GANTrainConfig(),
    physics: PhysicsConfig = PhysicsConfig(),
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 5000,
    log_every: int = 200,
    log_fn=print,
) -> Tuple[Any, Dict[str, Any]]:
    """Full training run; returns (generator_variables, diagnostics).

    generator_variables plug directly into solvers.make_generator_apply
    (with outputs divided by cfg.scale via the returned wrapper info).
    """
    g, d, opt_g, opt_d, state = init_gan(key, cfg)
    sampler = make_slf_sampler(physics)
    step_fn = jax.jit(make_train_step(g, d, opt_g, opt_d, cfg, sampler))

    metrics_hist = []
    for i in range(cfg.steps):
        key, k = jax.random.split(key)
        state, m = step_fn(state, k)
        if (i + 1) % log_every == 0:
            m = jax.device_get(m)
            metrics_hist.append((i + 1, float(m["d_loss"]), float(m["g_loss"])))
            log_fn(f"gan step {i+1}: d_loss {m['d_loss']:.4f} "
                   f"g_loss {m['g_loss']:.4f}")
        if checkpoint_dir and (i + 1) % checkpoint_every == 0:
            save_checkpoint(
                f"{checkpoint_dir}/step_{i+1}",
                {"params": state.g_params,
                 "batch_stats": state.g_batch_stats,
                 "scale": cfg.scale})
    variables = {"params": state.g_params, "batch_stats": state.g_batch_stats}
    if checkpoint_dir:
        save_checkpoint(f"{checkpoint_dir}/final",
                        {**variables, "scale": cfg.scale})
    return variables, {"metrics": metrics_hist, "scale": cfg.scale}
