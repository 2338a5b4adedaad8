"""Diagnose the MLE-GAN recovery quality: prior representational power,
sigma sensitivity, sampling sensitivity."""

import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

t0 = time.time()
print("backend:", jax.default_backend(), flush=True)

from quantized_spectrum_cartography_tpu.config import (
    PhysicsConfig, QuantizerConfig, SolverConfig)
from quantized_spectrum_cartography_tpu.ops import boundaries as B
from quantized_spectrum_cartography_tpu.ops.quantizer import quantize_log
from quantized_spectrum_cartography_tpu.ops.metrics import nmse
from quantized_spectrum_cartography_tpu.physics import (
    generate_onebit_problem, sample_entry_mask)
from quantized_spectrum_cartography_tpu.models import make_generator
from quantized_spectrum_cartography_tpu.solvers import (
    make_generator_apply, recover_mle_gan, recover_masked_mse)
from quantized_spectrum_cartography_tpu.training import load_checkpoint

state = load_checkpoint("/root/repo/checkpoints/gan256/final")
scale = float(state.pop("scale"))
g = make_generator(256)
raw = make_generator_apply(g, {"params": state["params"],
                               "batch_stats": state["batch_stats"]})
gen = lambda Z: raw(Z) / scale

pcfg = PhysicsConfig()
prob = generate_onebit_problem(jax.random.PRNGKey(2), pcfg, 0.1)

# --- A: prior representational power: masked-MSE completion of the true
#        SLFs (optimization.ipynb cell 17 protocol, f=0.2) ---------------
for r in range(2):
    S_true_r = prob.S_true[r]
    mask = jax.random.bernoulli(jax.random.PRNGKey(10 + r), 0.2,
                                S_true_r.shape).astype(jnp.float32)
    S_hat, z, losses = recover_masked_mse(
        jax.random.PRNGKey(20 + r), gen, mask, S_true_r * mask,
        num_global=200, num_local=200, adam_steps=300)
    err = float(nmse(S_hat, S_true_r))
    print(f"[{time.time()-t0:5.0f}s] A: prior completion NMSE_S (emitter {r}): "
          f"{err:.4f}", flush=True)

# --- B: sigma sweep on the headline 2-bit problem -----------------------
for sigma in [5.0, 2.5, 1.287]:
    qcfg = QuantizerConfig(boundaries=B.QUANTIZATION_BOUNDARIES_4_BINS,
                           noise_std=sigma, log_offset=B.LOG_OFFSET_4)
    Y = quantize_log(jax.random.PRNGKey(3), prob.T_true, sigma,
                     jnp.asarray(np.array(qcfg.boundaries)), qcfg.log_offset)
    mask = sample_entry_mask(jax.random.PRNGKey(4), Y.shape, 0.1)
    scfg = SolverConfig(max_iters=250, z_search_global=200, z_search_local=200)
    res = recover_mle_gan(jax.random.PRNGKey(5), Y, mask, gen, scfg, qcfg,
                          T_true=prob.T_true)
    nm = np.asarray(res.nmses)
    print(f"[{time.time()-t0:5.0f}s] B: sigma={sigma}: nmse final "
          f"{nm[-1]:.4f} best {nm.min():.4f}", flush=True)

# --- C: denser sampling (f=0.5), sigma=2.5 ------------------------------
qcfg = QuantizerConfig(boundaries=B.QUANTIZATION_BOUNDARIES_4_BINS,
                       noise_std=2.5, log_offset=B.LOG_OFFSET_4)
Y = quantize_log(jax.random.PRNGKey(6), prob.T_true, 2.5,
                 jnp.asarray(np.array(qcfg.boundaries)), qcfg.log_offset)
mask = sample_entry_mask(jax.random.PRNGKey(7), Y.shape, 0.5)
res = recover_mle_gan(jax.random.PRNGKey(8), Y, mask, gen,
                      SolverConfig(max_iters=250, z_search_global=200,
                                   z_search_local=200), qcfg,
                      T_true=prob.T_true)
nm = np.asarray(res.nmses)
print(f"[{time.time()-t0:5.0f}s] C: f=0.5 sigma=2.5: nmse final {nm[-1]:.4f} "
      f"best {nm.min():.4f}", flush=True)

# --- D: 16-bin adjusted boundaries (more information) -------------------
qcfg = QuantizerConfig(boundaries=B.QUANTIZATION_BOUNDARIES_16_ADJUSTED,
                       noise_std=0.5, log_offset=B.LOG_OFFSET_16_ADJUSTED)
Y = quantize_log(jax.random.PRNGKey(9), prob.T_true, 0.5,
                 jnp.asarray(np.array(qcfg.boundaries)), qcfg.log_offset)
mask = sample_entry_mask(jax.random.PRNGKey(11), Y.shape, 0.1)
res = recover_mle_gan(jax.random.PRNGKey(12), Y, mask, gen,
                      SolverConfig(max_iters=250, z_search_global=200,
                                   z_search_local=200), qcfg,
                      T_true=prob.T_true)
nm = np.asarray(res.nmses)
print(f"[{time.time()-t0:5.0f}s] D: 16-bin sigma=0.5: nmse final {nm[-1]:.4f} "
      f"best {nm.min():.4f}", flush=True)
print("DONE", flush=True)
