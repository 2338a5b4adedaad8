"""Quantized-recovery quality table with the canonical vae_best prior
(loads latent_dim/beta/amp metadata from the checkpoint; see
tools/prior_push_tpu.py for how the canonical prior is selected)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

t0 = time.time()
print("backend:", jax.default_backend(), flush=True)

from quantized_spectrum_cartography_tpu.config import (
    PhysicsConfig, QuantizerConfig, SolverConfig)
from quantized_spectrum_cartography_tpu.ops import boundaries as B
from quantized_spectrum_cartography_tpu.ops.metrics import nmse, nmse_log
from quantized_spectrum_cartography_tpu.ops.quantizer import quantize_log
from quantized_spectrum_cartography_tpu.physics import (
    generate_onebit_problem, sample_entry_mask)
from quantized_spectrum_cartography_tpu.solvers import (
    make_vae_generator, recover_mle_gan)
from quantized_spectrum_cartography_tpu.solvers.calibrate import (
    recalibrate_gain)
from quantized_spectrum_cartography_tpu.training import load_checkpoint

PCFG = PhysicsConfig()
ck = load_checkpoint("/root/repo/checkpoints/vae_best/final")
latent = int(ck["latent_dim"])
gen = make_vae_generator({"params": ck["params"],
                          "batch_stats": ck["batch_stats"]},
                         latent, float(ck["beta"]), amp=float(ck["amp"]))
print(f"prior: vae_best latent={latent}", flush=True)

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
                        z_search_local=200, z_dim=latent)
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
