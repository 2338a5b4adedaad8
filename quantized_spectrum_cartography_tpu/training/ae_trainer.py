"""Completion-autoencoder training (the Nasdac/DeepComp prior).

The reference ships trained AE checkpoints ('1bit_map' AutoencoderSelu
driving deep_comp.py and nn_descent_ae.py) but no training script — this
pipeline rebuilds it: masked SLF completion with MSE loss on simulator
data, matching the SLFDataset(1bit) input convention
(mask || masked map -> full map).
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
from quantized_spectrum_cartography_tpu.models import Autoencoder
from quantized_spectrum_cartography_tpu.training.checkpoints import save_checkpoint


@dataclasses.dataclass(frozen=True)
class AETrainConfig:
    batch_size: int = 64
    lr: float = 1e-3
    steps: int = 10000
    activation: str = "selu"
    onebit_input: bool = False   # SLFDataset1bit-style +-1 inputs
    # The decoder head is a sigmoid (models/ae.py:89, matching the
    # reference AutoencoderSelu, networks/ae.py:100), so targets MUST live
    # in [0, 1).  Simulator SLFs are Frobenius-normalized with peak ~0.26
    # (p99 0.31); x2.5 fills the sigmoid range the way the reference's
    # fro-normalized .pt training maps did.  (A larger scale makes peaks
    # unrepresentable and the model saturates — the round-2 checkpoint was
    # trained at 50.0 and reproduced peaks at 0.08x, the direct cause of
    # the round-2 miss-detection plateau.)
    scale: float = 2.5
    # Peak events (the detection protocol, joint_opt_ae.m:514-544) live on
    # a handful of pixels per map; unweighted MSE underweights them and
    # the completer reproduces peaks at ~0.73x (tools/ae_peak_diag.py).
    # Loss weight 1 + peak_weight * target/max(target) concentrates
    # capacity on the peak plateau without changing the optimum.
    peak_weight: float = 4.0
    # 'slf'   — single spatial loss fields (SLFDataset semantics; the
    #           Nasdac per-emitter completion input)
    # 'band'  — single frequency bands of full rank-R maps (mixtures), the
    #           DeepComp per-band completion input (deep_comp.py:21-42)
    # 'mixed' — alternate halves of each batch
    data_mode: str = "slf"


def train_ae(
    key: jax.Array,
    cfg: AETrainConfig = AETrainConfig(),
    physics: PhysicsConfig = PhysicsConfig(),
    checkpoint_dir: Optional[str] = None,
    log_every: int = 200,
    log_fn=print,
) -> Tuple[Any, Dict[str, Any]]:
    model = Autoencoder(activation=cfg.activation)
    k0, key = jax.random.split(key)
    variables = model.init(k0, jnp.zeros((1, 51, 51, 2)), train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt = optax.adam(cfg.lr)
    opt_state = opt.init(params)

    slf_sampler = make_slf_sampler(physics)
    bcfg = SLFBatchConfig(batch_size=cfg.batch_size, onebit=cfg.onebit_input)

    def band_sampler(k, n):
        # single bands of full rank-R maps: sample n SLF pairs + a random
        # column of an L2-normalized PSD-like weight vector per map
        from quantized_spectrum_cartography_tpu.physics.psd import (
            column_normalize)
        k1, k2 = jax.random.split(k)
        R = physics.num_emitters
        slfs = slf_sampler(k1, n * R).reshape(n, R, *((physics.grid_size,) * 2))
        w = jnp.abs(jax.random.normal(k2, (n, R, 1, 1))) * 0.3
        return jnp.sum(slfs * w, axis=1)

    if cfg.data_mode == "slf":
        sampler = slf_sampler
    elif cfg.data_mode == "band":
        sampler = band_sampler
    else:                                      # 'mixed'
        def sampler(k, n):
            k1, k2 = jax.random.split(k)
            half = n // 2
            return jnp.concatenate(
                [slf_sampler(k1, half), band_sampler(k2, n - half)])

    def loss_fn(params, batch_stats, inp, target):
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats}, inp, train=True,
            mutable=["batch_stats"])
        peak = jnp.max(target, axis=(1, 2, 3), keepdims=True)
        w = 1.0 + cfg.peak_weight * target / jnp.maximum(peak, 1e-12)
        return jnp.mean(w * jnp.square(out - target)), mut["batch_stats"]

    @jax.jit
    def step(params, batch_stats, opt_state, k):
        k1, k2 = jax.random.split(k)
        maps = sampler(k1, cfg.batch_size) * cfg.scale
        inp, target = mask_batch(k2, maps, bcfg)
        (loss, batch_stats), g = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, inp, target)
        up, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, up), batch_stats, opt_state, loss

    hist = []
    for i in range(cfg.steps):
        key, k = jax.random.split(key)
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, k)
        if (i + 1) % log_every == 0:
            hist.append((i + 1, float(loss)))
            log_fn(f"ae step {i+1}: mse {float(loss):.6f}")
    variables = {"params": params, "batch_stats": batch_stats}
    if checkpoint_dir:
        save_checkpoint(f"{checkpoint_dir}/final",
                        {**variables, "scale": cfg.scale})
    return variables, {"metrics": hist, "scale": cfg.scale}


def make_ae_completer(model: Autoencoder, variables, scale: float):
    """Pure fn (mask [I,J], observed [I,J]) -> completed map [I,J] — the
    DeepComp one-shot completion (`backup/algorithms/deep_comp.py:21-42`)."""

    def complete(mask: jnp.ndarray, observed: jnp.ndarray) -> jnp.ndarray:
        inp = jnp.stack([mask, observed * mask * scale], -1)[None]
        out = model.apply(variables, inp, train=False)
        return out[0, :, :, 0] / scale

    return complete


def make_ae_latent_fns(model: Autoencoder, variables, scale: float):
    """(encode, decode) pure fns for the committed-reference DowJons
    S-step (`joint_opt_ae.m:29` use_gan=false -> `nn_descent_ae.py:
    run_descent_ae`, which Adam-descends the AE's LATENT code through
    `autoencoder.decoder`, seeded by `model_ae`'s `encoder(test_slf)`).

    encode: (mask [R,I,J] or [I,J], S [R,I,J] raw SLF amplitude) -> z
    [R, latent]; decode: z -> S [R,I,J] raw amplitude (the training
    `scale` convention is internal to both)."""

    def encode(mask: jnp.ndarray, S: jnp.ndarray) -> jnp.ndarray:
        m = jnp.broadcast_to(mask, S.shape)
        inp = jnp.stack([m, S * m * scale], -1)
        return model.apply(variables, inp, train=False,
                           method=Autoencoder.encode)

    def decode(z: jnp.ndarray) -> jnp.ndarray:
        out = model.apply(variables, z, train=False,
                          method=Autoencoder.decode)
        return out[:, :, :, 0] / scale

    return encode, decode


def make_ae_input_fn(model: Autoencoder, variables, scale: float):
    """Raw batched apply on the network's OWN input layout — the variable
    `solvers.completion.run_descent_ae` optimizes (nn_descent_ae.py:106
    `test_slf = z; test_slf.requires_grad = True`): x [R, I, J, 2]
    (mask-channel, scale*map-channel) -> completed SLFs [R, I, J]."""

    def apply(x: jnp.ndarray) -> jnp.ndarray:
        out = model.apply(variables, x, train=False)
        return out[:, :, :, 0] / scale

    return apply
