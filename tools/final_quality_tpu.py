"""Consolidated quality run:
1. KL-warm-up robustness check (key 3 retrained with warm-up),
2. canonical vae_best checkpoint = best of candidates (scored),
3. recovery table across quantizer configs with gain recalibration,
   reporting NMSE and NMSE_LOG.
"""

import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

t0 = time.time()
print("backend:", jax.default_backend(), flush=True)

from quantized_spectrum_cartography_tpu.config import (
    PhysicsConfig, QuantizerConfig, SolverConfig)
from quantized_spectrum_cartography_tpu.data.datasets import make_slf_sampler
from quantized_spectrum_cartography_tpu.ops import boundaries as B
from quantized_spectrum_cartography_tpu.ops.metrics import nmse, nmse_log
from quantized_spectrum_cartography_tpu.ops.quantizer import quantize_log
from quantized_spectrum_cartography_tpu.physics import (
    generate_onebit_problem, sample_entry_mask)
from quantized_spectrum_cartography_tpu.solvers import (
    make_vae_generator, recalibrate_gain, recover_masked_mse,
    recover_mle_gan)
from quantized_spectrum_cartography_tpu.training import (
    VAETrainConfig, load_checkpoint, train_vae)
from quantized_spectrum_cartography_tpu.training.checkpoints import (
    save_checkpoint)

PCFG = PhysicsConfig()
sampler = make_slf_sampler(PCFG)
eval_slfs = sampler(jax.random.PRNGKey(999), 4)


def completion_score(gen, z_dim, tag):
    errs = []
    for i in range(4):
        S_true = eval_slfs[i]
        mask = jax.random.bernoulli(jax.random.PRNGKey(50 + i), 0.2,
                                    S_true.shape).astype(jnp.float32)
        S_hat, _, _ = recover_masked_mse(
            jax.random.PRNGKey(60 + i), gen, mask, S_true * mask,
            z_dim=z_dim, num_global=300, num_local=200, adam_steps=400)
        errs.append(float(nmse(S_hat, S_true)))
    m = float(np.mean(errs))
    print(f"[{time.time()-t0:5.0f}s] {tag}: completion NMSE_S {m:.4f}",
          flush=True)
    return m


# --- 1. warm-up robustness: retrain the collapsing seed -----------------
cfg = VAETrainConfig(latent_dim=64, beta=0.5, steps=20000, batch_size=64)
vv3, _ = train_vae(jax.random.PRNGKey(3), cfg, log_every=20000,
                   log_fn=lambda m: None)
s3 = completion_score(make_vae_generator(vv3, 64, 0.5), 64,
                      "key3-20000 WITH warm-up (was 0.965 without)")

# --- 2. canonical checkpoint --------------------------------------------
vv2 = load_checkpoint("/root/repo/checkpoints/vae64/final")
s2 = completion_score(make_vae_generator(vv2, 64, 0.5), 64, "key2 (saved)")
best_vv, best_s = (vv2, s2) if s2 <= s3 else (vv3, s3)
save_checkpoint("/root/repo/checkpoints/vae_best/final",
                {**best_vv, "latent_dim": jnp.int32(64),
                 "beta": jnp.float32(0.5), "amp": jnp.float32(0.26)})
print(f"[{time.time()-t0:5.0f}s] vae_best/final <- score {min(s2, s3):.4f}",
      flush=True)
gen = make_vae_generator(best_vv, 64, 0.5)

# --- 3. recovery table ---------------------------------------------------
prob = generate_onebit_problem(jax.random.PRNGKey(2), PCFG, 0.1)
CONFIGS = [
    ("2-bit  sigma=5 (headline)", B.QUANTIZATION_BOUNDARIES_4_BINS,
     B.LOG_OFFSET_4, 5.0),
    ("2-bit  sigma=1.287 (SD_4)", B.QUANTIZATION_BOUNDARIES_4_BINS,
     B.LOG_OFFSET_4, 1.287),
    ("3-bit  sigma=1 (7-adj)", B.QUANTIZATION_BOUNDARIES_7_ADJUSTED,
     B.LOG_OFFSET_7_ADJUSTED, 1.0),
    ("4-bit  sigma=0.5 (16-adj)", B.QUANTIZATION_BOUNDARIES_16_ADJUSTED,
     B.LOG_OFFSET_16_ADJUSTED, 0.5),
]
for name, bbt, offset, sigma in CONFIGS:
    bb = jnp.asarray(np.array(bbt), jnp.float32)
    qcfg = QuantizerConfig(boundaries=tuple(bbt), noise_std=sigma,
                           log_offset=offset)
    Y = quantize_log(jax.random.PRNGKey(3), prob.T_true, sigma, bb, offset)
    mask = sample_entry_mask(jax.random.PRNGKey(4), Y.shape, 0.1)
    scfg = SolverConfig(max_iters=300, z_search_global=200,
                        z_search_local=200, z_dim=64)
    res = recover_mle_gan(jax.random.PRNGKey(5), Y, mask, gen, scfg, qcfg,
                          T_true=prob.T_true)
    gamma, T_cal = recalibrate_gain(res.T_hat, Y, bb, sigma, offset, mask)
    raw_n = float(nmse(res.T_hat, prob.T_true))
    cal_n = float(nmse(T_cal, prob.T_true))
    raw_l = float(nmse_log(jnp.maximum(res.T_hat, 0), prob.T_true, offset))
    cal_l = float(nmse_log(jnp.maximum(T_cal, 0), prob.T_true, offset))
    print(f"[{time.time()-t0:5.0f}s] {name}: NMSE {raw_n:.4f} -> cal "
          f"{cal_n:.4f} (gamma {float(gamma):.2f}) | NMSE_LOG {raw_l:.4f} "
          f"-> {cal_l:.4f}", flush=True)
print("DONE", flush=True)
