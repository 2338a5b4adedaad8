"""Peak-weighted VAE prior candidate: train one seed, evaluate the
decoder's peak-amplitude ceiling and prior-completion quality against
the canonical checkpoint.

The canonical vae_best decoder renders SLF peaks at ~0.71x under a dense
z-fit (tools/vae_peak_diag.py) — the expressivity ceiling for every
DowJons recovery and the dominant term in its residual miss probability.
This trains latent-128 beta-0.5 free-bits VAEs with reconstruction
weight 1 + pw*target and reports, for raw and EMA weights:

- dense z-fit peak ratio + rel MSE (expressivity),
- prior-completion NMSE_S at f=0.2 (optimization.ipynb cell 17/19
  protocol — the round-2 report metric).

Usage: python tools/vae_peakweight_tpu.py [steps] [peak_weight] [seed]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
PW = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0
SEED = int(sys.argv[3]) if len(sys.argv) > 3 else 0

t0 = time.time()


def log(*a):
    print(f"[{time.time()-t0:6.1f}s]", *a, flush=True)


log("backend:", jax.default_backend())

from quantized_spectrum_cartography_tpu.config import PhysicsConfig
from quantized_spectrum_cartography_tpu.data.datasets import make_slf_sampler
from quantized_spectrum_cartography_tpu.ops.metrics import nmse
from quantized_spectrum_cartography_tpu.solvers.completion import (
    optimize_z, recover_masked_mse)
from quantized_spectrum_cartography_tpu.solvers.vae_prior import (
    DEFAULT_AMP, make_vae_generator)
from quantized_spectrum_cartography_tpu.training import (
    VAETrainConfig, train_vae)
from quantized_spectrum_cartography_tpu.training.checkpoints import (
    save_checkpoint)

cfg = VAETrainConfig(latent_dim=128, beta=0.5, steps=STEPS,
                     batch_size=64, free_bits=0.1, ema_decay=0.999,
                     peak_weight=PW)
log(f"training: steps={STEPS} pw={PW} seed={SEED}")
variables, info = train_vae(jax.random.PRNGKey(SEED), cfg,
                            PhysicsConfig(), log_fn=log, log_every=2000)
log("trained")

sampler = make_slf_sampler(PhysicsConfig())
slfs = np.asarray(sampler(jax.random.PRNGKey(100), 16))
targets = jnp.asarray(slfs)

results = {}
for tag, var in (("raw", variables),
                 ("ema", {"params": info["variables_ema"]["params"],
                          "batch_stats": variables["batch_stats"]})):
    gen = make_vae_generator(var, 128, 0.5, DEFAULT_AMP)
    fit = jax.jit(jax.vmap(lambda t, k: optimize_z(
        k, gen, t[None], adam_steps=600, z_dim=128)[0][0]))
    outs = np.asarray(fit(targets,
                          jax.random.split(jax.random.PRNGKey(1), 16)))
    ratios, rel = [], []
    for b in range(16):
        i, j = np.unravel_index(np.argmax(slfs[b]), slfs[b].shape)
        ratios.append(outs[b, i, j] / slfs[b, i, j])
        rel.append(float(np.mean((outs[b] - slfs[b]) ** 2)
                         / np.mean(slfs[b] ** 2)))
    # prior completion at f=0.2 (report metric)
    comp = []
    for b in range(4):
        m = (jax.random.uniform(jax.random.fold_in(
            jax.random.PRNGKey(2), b), (51, 51)) < 0.2).astype(jnp.float32)
        S_hat, _, _ = recover_masked_mse(
            jax.random.fold_in(jax.random.PRNGKey(3), b), gen, m,
            jnp.asarray(slfs[b]) * m, z_dim=128, num_global=50,
            num_local=50, adam_steps=400)
        comp.append(float(nmse(S_hat, jnp.asarray(slfs[b]))))
    results[tag] = {
        "peak_ratio_median": round(float(np.median(ratios)), 3),
        "peak_ratio_p10": round(float(np.percentile(ratios, 10)), 3),
        "zfit_rel_mse_median": round(float(np.median(rel)), 4),
        "completion_nmse_mean": round(float(np.mean(comp)), 4),
        "completion_nmse": [round(v, 4) for v in comp],
    }
    log(tag, json.dumps(results[tag]))

out = {"steps": STEPS, "peak_weight": PW, "seed": SEED,
       "canonical_baseline": {"peak_ratio_median": 0.713,
                              "zfit_rel_mse_median": 0.0311,
                              "completion_nmse_best_seed": 0.171},
       "results": results, "wall_seconds": round(time.time() - t0, 1)}
with open("/root/repo/VAE_PEAKWEIGHT.json", "w") as f:
    json.dump(out, f, indent=1)
log("wrote VAE_PEAKWEIGHT.json")

best = ("ema" if results["ema"]["completion_nmse_mean"]
        <= results["raw"]["completion_nmse_mean"] else "raw")
var = (variables if best == "raw"
       else {"params": info["variables_ema"]["params"],
             "batch_stats": variables["batch_stats"]})
save_checkpoint("/root/repo/checkpoints/vae_pw/final",
                {**var, "latent_dim": 128, "beta": 0.5,
                 "amp": DEFAULT_AMP})
log(f"saved {best} weights to checkpoints/vae_pw/final")
