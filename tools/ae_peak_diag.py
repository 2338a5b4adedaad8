"""How well does the committed completion AE reproduce SLF peaks?

Draw SLFs from the simulator, mask at several fractions, complete with
the checkpoint AE, and report hat/true ratio at the true peak pixel and
at the 99.9th-percentile pixels.  Also reconstructs FULLY-observed maps
(mask=1) to split 'completion uncertainty' from 'decoder can't make
peaks'.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

t0 = time.time()


def log(*a):
    print(f"[{time.time()-t0:6.1f}s]", *a, flush=True)


from quantized_spectrum_cartography_tpu.baselines.pretrained import AE_CKPT
from quantized_spectrum_cartography_tpu.config import PhysicsConfig
from quantized_spectrum_cartography_tpu.data.datasets import make_slf_sampler
from quantized_spectrum_cartography_tpu.models import Autoencoder
from quantized_spectrum_cartography_tpu.training import load_checkpoint
from quantized_spectrum_cartography_tpu.training.ae_trainer import (
    make_ae_completer)

state = dict(load_checkpoint(AE_CKPT))
scale = float(state.pop("scale"))
log("ae scale:", scale)
complete = make_ae_completer(Autoencoder(activation="selu"), state, scale)

N = 64
slfs = make_slf_sampler(PhysicsConfig())(jax.random.PRNGKey(0), N)
slfs = np.asarray(slfs)

vc = jax.jit(jax.vmap(complete))

for frac in (1.0, 0.2, 0.1, 0.05):
    key = jax.random.PRNGKey(1)
    masks = (jax.random.uniform(key, (N, 51, 51)) < frac).astype(
        jnp.float32) if frac < 1.0 else jnp.ones((N, 51, 51))
    outs = np.asarray(vc(masks, jnp.asarray(slfs)))
    ratios = []
    for b in range(N):
        i, j = np.unravel_index(np.argmax(slfs[b]), slfs[b].shape)
        ratios.append(outs[b, i, j] / slfs[b, i, j])
    ratios = np.asarray(ratios)
    mse = float(np.mean((outs - slfs) ** 2) / np.mean(slfs ** 2))
    log(f"frac={frac}: peak ratio median {np.median(ratios):.3f} "
        f"p10 {np.percentile(ratios,10):.3f} p90 "
        f"{np.percentile(ratios,90):.3f}; rel MSE {mse:.4f}")
