"""Selection-free prior quality: 5 seeds, longer training + EMA +
training-time selection criterion.

Round 2 left completion NMSE_S spread at 0.17-0.55 (mean 0.31) across
seeds with the canonical checkpoint chosen by a downstream probe.  This
run trains latent-128 beta-0.5 free-bits VAEs on 5 seeds for 60k steps
with EMA(0.999), and reports per seed:

- held-out ELBO terms (training-time criterion, no downstream probe) for
  raw and EMA weights,
- prior-completion NMSE_S (optimization.ipynb cell 17/19 protocol) for
  raw and EMA weights — the *report* metric, not the selection input.

Target (VERDICT task 7): median <= 0.25, worst <= 0.35 — or the held-out
ELBO ranking demonstrably picking a near-best seed.  Writes
PRIOR_SEEDS.json.

Usage: python tools/prior_seeds_tpu.py [steps] [n_seeds]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
NSEEDS = int(sys.argv[2]) if len(sys.argv) > 2 else 5

t0 = time.time()


def log(*a):
    print(f"[{time.time()-t0:6.1f}s]", *a, flush=True)


log("backend:", jax.default_backend())

from quantized_spectrum_cartography_tpu.config import PhysicsConfig
from quantized_spectrum_cartography_tpu.data.datasets import make_slf_sampler
from quantized_spectrum_cartography_tpu.models import VAE
from quantized_spectrum_cartography_tpu.ops.metrics import nmse
from quantized_spectrum_cartography_tpu.solvers import recover_masked_mse
from quantized_spectrum_cartography_tpu.training import (
    VAETrainConfig, heldout_elbo, train_vae)
from quantized_spectrum_cartography_tpu.training.checkpoints import (
    save_checkpoint)

pcfg = PhysicsConfig()
sampler = make_slf_sampler(pcfg)
eval_slfs = sampler(jax.random.PRNGKey(999), 4)

LATENT = 128
cfg = VAETrainConfig(steps=STEPS, latent_dim=LATENT, batch_size=64,
                     beta=0.5, free_bits=0.1, ema_decay=0.999)
vae = VAE(latent_dim=LATENT, beta=cfg.beta)


def completion_probe(vvars):
    """optimization.ipynb cell 17/19 protocol: 20%-masked SLF recovery
    through the frozen decoder, mean NMSE_S over 4 held-out SLFs."""
    def gen(Z, v=vvars):
        out = vae.apply(v, Z, train=False, method=VAE.decode)
        return out[..., 0] * 0.26

    errs = []
    for i in range(4):
        S_true = eval_slfs[i]
        mask = jax.random.bernoulli(jax.random.PRNGKey(50 + i), 0.2,
                                    S_true.shape).astype(jnp.float32)
        S_hat, _, _ = recover_masked_mse(
            jax.random.PRNGKey(60 + i), gen, mask, S_true * mask,
            z_dim=LATENT, num_global=300, num_local=200, adam_steps=400)
        errs.append(float(nmse(S_hat, S_true)))
    return float(np.mean(errs))


results = []
for seed in range(1, NSEEDS + 1):
    vvars, vdiag = train_vae(
        jax.random.PRNGKey(seed), cfg,
        log_every=max(STEPS // 4, 1),
        log_fn=lambda m, s=seed: log(f"seed{s} {m}"))
    final_kl = vdiag["metrics"][-1][3]
    evars = vdiag["variables_ema"]

    crit_raw = heldout_elbo(cfg, vvars)
    crit_ema = heldout_elbo(cfg, evars)
    comp_raw = completion_probe(vvars)
    comp_ema = completion_probe(evars)
    results.append({
        "seed": seed, "final_kl": final_kl,
        "heldout_raw": crit_raw, "heldout_ema": crit_ema,
        "completion_raw": round(comp_raw, 4),
        "completion_ema": round(comp_ema, 4),
    })
    log(f"seed{seed}: kl {final_kl:.2f} | heldout bce "
        f"{crit_raw['bce']:.2f}/{crit_ema['bce']:.2f} (raw/ema) | "
        f"completion {comp_raw:.4f}/{comp_ema:.4f} (raw/ema)")
    # checkpoint every seed's EMA weights (re-selectable later)
    save_checkpoint(f"/root/repo/checkpoints/vae_seeds/seed{seed}_ema",
                    {**evars, "latent_dim": jnp.int32(LATENT),
                     "beta": jnp.float32(cfg.beta)})

for variant in ("raw", "ema"):
    comps = np.asarray([r[f"completion_{variant}"] for r in results])
    log(f"{variant}: median {np.median(comps):.4f} worst {comps.max():.4f} "
        f"mean {comps.mean():.4f}")

# does the training-time criterion pick a good seed?
by_elbo = min(results, key=lambda r: r["heldout_ema"]["elbo_loss"])
best_comp = min(r["completion_ema"] for r in results)
summary = {
    "steps": STEPS, "latent": LATENT, "ema_decay": 0.999,
    "free_bits": 0.1, "seeds": results,
    "median_completion_ema": float(np.median(
        [r["completion_ema"] for r in results])),
    "worst_completion_ema": float(np.max(
        [r["completion_ema"] for r in results])),
    "median_completion_raw": float(np.median(
        [r["completion_raw"] for r in results])),
    "worst_completion_raw": float(np.max(
        [r["completion_raw"] for r in results])),
    "elbo_selected_seed": by_elbo["seed"],
    "elbo_selected_completion": by_elbo["completion_ema"],
    "best_completion": best_comp,
    "selection_regret": round(by_elbo["completion_ema"] - best_comp, 4),
}
with open("/root/repo/PRIOR_SEEDS.json", "w") as f:
    json.dump(summary, f, indent=1)
log(json.dumps({k: v for k, v in summary.items() if k != "seeds"}))
log("DONE")
