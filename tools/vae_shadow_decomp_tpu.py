"""Decompose the decoder peak-ratio ceiling: shadowed vs shadow-free
targets.

Dense z-fit of the round-4 prior against simulator SLFs with and
without log-normal shadowing.  Measured (round 4): shadowed 0.727 /
shadow-free 0.861 on this probe's draws — the ceiling splits into a
KL-capacity term (the 0.86 shadow-free limit) and ~0.13 of per-draw
shadowing idiosyncrasy at the peak pixel that no smooth low-dimensional
prior can encode.  Backs the RESULTS.md "resolved decomposition"
section.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
t0=time.time()
def log(*a): print(f"[{time.time()-t0:6.1f}s]", *a, flush=True)
from quantized_spectrum_cartography_tpu.config import PhysicsConfig
from quantized_spectrum_cartography_tpu.data.datasets import make_slf_sampler
from quantized_spectrum_cartography_tpu.solvers import optimize_z
from quantized_spectrum_cartography_tpu.solvers.vae_prior import load_vae_prior

gen, zd, _ = load_vae_prior("/root/repo/checkpoints/vae_heads/softplus_mse_wide")
log("loaded, z", zd)
for tag, sigma in [("shadowed", 5.0), ("shadow-free", 0.0)]:
    slfs = np.asarray(make_slf_sampler(PhysicsConfig(shadow_sigma=sigma))(
        jax.random.PRNGKey(0), 16))
    fit = jax.jit(jax.vmap(lambda t, k: optimize_z(
        k, gen, t[None], adam_steps=600, z_dim=zd)[0][0]))
    outs = np.asarray(fit(jnp.asarray(slfs),
                          jax.random.split(jax.random.PRNGKey(1), 16)))
    ratios=[]
    for b in range(16):
        i,j = np.unravel_index(np.argmax(slfs[b]), slfs[b].shape)
        ratios.append(outs[b,i,j]/slfs[b][i,j])
    r=np.asarray(ratios)
    log(f"{tag}: ratio median {np.median(r):.3f} p10 {np.percentile(r,10):.3f} p90 {np.percentile(r,90):.3f}")
