"""Peak-representation ceiling of the canonical VAE prior.

Fit z to TRUE SLFs densely (no mask, 600 Adam steps — pure expressivity,
no completion uncertainty) and report the hat/true ratio at the true
peak pixel.  If the decoder can't render peaks at full amplitude, that
ceiling propagates to every DowJons recovery regardless of init or
restarts.
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


from quantized_spectrum_cartography_tpu.baselines.pretrained import VAE_CKPT
from quantized_spectrum_cartography_tpu.config import PhysicsConfig
from quantized_spectrum_cartography_tpu.data.datasets import make_slf_sampler
from quantized_spectrum_cartography_tpu.solvers.completion import optimize_z
from quantized_spectrum_cartography_tpu.solvers.vae_prior import load_vae_prior

gen, z_dim, _ = load_vae_prior(VAE_CKPT)
log("z_dim:", z_dim)

N = 16
slfs = np.asarray(make_slf_sampler(PhysicsConfig())(
    jax.random.PRNGKey(0), N))
targets = jnp.asarray(slfs)   # SLF units — the generator's own amplitude
                              # convention (solvers/vae_prior.py gen
                              # multiplies the sigmoid decoder by
                              # DEFAULT_AMP=0.26)

fit = jax.jit(jax.vmap(lambda t, k: optimize_z(
    k, gen, t[None], adam_steps=600, z_dim=z_dim)[0][0]))
outs = np.asarray(fit(targets, jax.random.split(jax.random.PRNGKey(1), N)))

ratios, rel = [], []
for b in range(N):
    i, j = np.unravel_index(np.argmax(slfs[b]), slfs[b].shape)
    t = np.asarray(targets[b])
    ratios.append(outs[b, i, j] / t[i, j])
    rel.append(float(np.mean((outs[b] - t) ** 2) / np.mean(t ** 2)))
ratios = np.asarray(ratios)
log(f"dense z-fit peak ratio: median {np.median(ratios):.3f} "
    f"p10 {np.percentile(ratios,10):.3f} p90 {np.percentile(ratios,90):.3f}")
log(f"rel MSE: median {np.median(rel):.4f}")
