"""Free-bits VAE: 5-seed posterior-collapse check + completion quality.

Round-1 finding (RESULTS.md): ~1 in 3 VAE seeds posterior-collapse
despite KL warm-up, worked around by probe-based checkpoint selection.
This run validates the free-bits fix (training/vae_trainer.py
VAETrainConfig.free_bits): trains latent-128 beta-0.5 VAEs on 5 seeds,
reports the final raw KL (collapse = KL near 0) and prior-completion
NMSE_S per seed (optimization.ipynb cell 17/19 protocol), and writes
VAE_FREEBITS.json.

Usage: python tools/vae_freebits_tpu.py [steps] [free_bits]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
FREE_BITS = float(sys.argv[2]) if len(sys.argv) > 2 else 0.05

t0 = time.time()
print("backend:", jax.default_backend(), flush=True)

from quantized_spectrum_cartography_tpu.config import PhysicsConfig
from quantized_spectrum_cartography_tpu.data.datasets import make_slf_sampler
from quantized_spectrum_cartography_tpu.models import VAE
from quantized_spectrum_cartography_tpu.ops.metrics import nmse
from quantized_spectrum_cartography_tpu.solvers import recover_masked_mse
from quantized_spectrum_cartography_tpu.training import VAETrainConfig, train_vae

pcfg = PhysicsConfig()
sampler = make_slf_sampler(pcfg)
eval_slfs = sampler(jax.random.PRNGKey(999), 4)

LATENT = 128
cfg = VAETrainConfig(steps=STEPS, latent_dim=LATENT, batch_size=64,
                     beta=0.5, free_bits=FREE_BITS)
vae = VAE(latent_dim=LATENT, beta=cfg.beta)

results = []
for seed in (1, 2, 3, 4, 5):
    vvars, vdiag = train_vae(
        jax.random.PRNGKey(seed), cfg,
        log_every=max(STEPS // 4, 1),
        log_fn=lambda m, s=seed: print(
            f"[{time.time()-t0:5.0f}s] seed{s} {m}", flush=True))
    final_kl = vdiag["metrics"][-1][3]

    def gen(Z, v=vvars):
        out = vae.apply(v, Z, train=False, method=VAE.decode)
        return out[..., 0] * 0.26      # peak-normalized -> SLF amplitude

    errs = []
    for i in range(4):
        S_true = eval_slfs[i]
        mask = jax.random.bernoulli(jax.random.PRNGKey(50 + i), 0.2,
                                    S_true.shape).astype(jnp.float32)
        S_hat, _, _ = recover_masked_mse(
            jax.random.PRNGKey(60 + i), gen, mask, S_true * mask,
            z_dim=LATENT, num_global=300, num_local=200, adam_steps=400)
        errs.append(float(nmse(S_hat, S_true)))
    score = float(np.mean(errs))
    collapsed = final_kl < 0.5
    results.append({"seed": seed, "final_kl": final_kl,
                    "completion_nmse_s": score, "collapsed": collapsed})
    print(f"[{time.time()-t0:5.0f}s] seed{seed}: kl {final_kl:.3f} "
          f"completion {score:.4f} collapsed={collapsed}", flush=True)

summary = {
    "steps": STEPS, "free_bits": FREE_BITS, "latent": LATENT,
    "seeds": results,
    "num_collapsed": sum(r["collapsed"] for r in results),
    "mean_completion": float(np.mean(
        [r["completion_nmse_s"] for r in results])),
    "worst_completion": float(np.max(
        [r["completion_nmse_s"] for r in results])),
}
with open("/root/repo/VAE_FREEBITS.json", "w") as f:
    json.dump(summary, f, indent=1)
print(json.dumps(summary), flush=True)
print("DONE", flush=True)
