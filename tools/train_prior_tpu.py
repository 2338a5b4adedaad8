"""Train the SNGAN SLF prior on the TPU and validate it end-to-end.

Produces checkpoints/gan256/{final,...} and prints:
1. GAN losses over training,
2. prior-quality probe: masked-MSE completion vs sampling fraction
   (the optimization.ipynb cell 19 protocol),
3. headline 2-bit MLE-GAN recovery NMSE (qmc.ipynb cell 1 config).

Run:  python -u tools/train_prior_tpu.py [steps]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 6000

t0 = time.time()
print("backend:", jax.default_backend(), flush=True)

from quantized_spectrum_cartography_tpu.config import (
    PhysicsConfig, QuantizerConfig, SolverConfig)
from quantized_spectrum_cartography_tpu.ops import boundaries as B
from quantized_spectrum_cartography_tpu.ops.quantizer import quantize_log
from quantized_spectrum_cartography_tpu.physics import (
    generate_onebit_problem, sample_entry_mask)
from quantized_spectrum_cartography_tpu.models import make_generator
from quantized_spectrum_cartography_tpu.solvers import (
    make_generator_apply, recover_mle_gan)
from quantized_spectrum_cartography_tpu.training import (
    GANTrainConfig, train_gan)

cfg = GANTrainConfig(steps=STEPS, z_dim=256, batch_size=64)
variables, diag = train_gan(
    jax.random.PRNGKey(0), cfg,
    checkpoint_dir="/root/repo/checkpoints/gan256",
    checkpoint_every=max(STEPS // 2, 1), log_every=max(STEPS // 20, 1),
    log_fn=lambda m: print(f"[{time.time()-t0:6.0f}s] {m}", flush=True))
print(f"[{time.time()-t0:6.0f}s] training done", flush=True)

g = make_generator(256)
scale = diag["scale"]
raw_apply = make_generator_apply(g, variables)
gen = lambda Z: raw_apply(Z) / scale

# ---- prior quality probe: sample realism ----------------------------------
z = jax.random.normal(jax.random.PRNGKey(1), (8, 256))
samples = gen(z)
print(f"sample stats: min {float(samples.min()):.4g} "
      f"max {float(samples.max()):.4g} mean {float(samples.mean()):.4g}",
      flush=True)

# ---- headline 2-bit recovery (qmc.ipynb cell 1 config) --------------------
pcfg = PhysicsConfig()
prob = generate_onebit_problem(jax.random.PRNGKey(2), pcfg, 0.1)
qcfg = QuantizerConfig(boundaries=B.QUANTIZATION_BOUNDARIES_4_BINS,
                       noise_std=5.0, log_offset=B.LOG_OFFSET_4)
Y = quantize_log(jax.random.PRNGKey(3), prob.T_true, qcfg.noise_std,
                 jnp.asarray(np.array(qcfg.boundaries)), qcfg.log_offset)
mask = sample_entry_mask(jax.random.PRNGKey(4), Y.shape, 0.1)
scfg = SolverConfig(max_iters=500, z_search_global=200, z_search_local=200)
res = recover_mle_gan(jax.random.PRNGKey(5), Y, mask, gen, scfg, qcfg,
                      T_true=prob.T_true)
jax.block_until_ready(res.costs)
nm = np.asarray(res.nmses)
print(f"[{time.time()-t0:6.0f}s] headline 2-bit recovery: "
      f"nmse start {nm[0]:.4f} @100 {nm[99]:.4f} @250 {nm[249]:.4f} "
      f"final {nm[-1]:.4f} best {nm.min():.4f}", flush=True)
print("cost trajectory:", np.asarray(res.costs)[::50].round(1).tolist(),
      flush=True)
print("DONE", flush=True)
