"""Prior-quality push: train stronger VAE configs, score with the
prior-completion probe (optimization.ipynb cell 17/19 protocol), compare
against the canonical checkpoint (vae_best/final, NMSE_S 0.204).

Saves any config that beats the canonical score to checkpoints/<tag>.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

t0 = time.time()
print("backend:", jax.default_backend(), flush=True)

from quantized_spectrum_cartography_tpu.config import PhysicsConfig
from quantized_spectrum_cartography_tpu.data.datasets import make_slf_sampler
from quantized_spectrum_cartography_tpu.ops.metrics import nmse
from quantized_spectrum_cartography_tpu.solvers import (
    make_vae_generator, recover_masked_mse)
from quantized_spectrum_cartography_tpu.training import (
    VAETrainConfig, load_checkpoint, train_vae)

sampler = make_slf_sampler(PhysicsConfig())
eval_slfs = sampler(jax.random.PRNGKey(999), 4)


def score(gen, z_dim, tag):
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
    print(f"[{time.time()-t0:5.0f}s] {tag}: mean {m:.4f} "
          f"{np.round(errs, 4).tolist()}", flush=True)
    return m


_ck = load_checkpoint("/root/repo/checkpoints/vae_best/final")
baseline = score(
    make_vae_generator({"params": _ck["params"],
                        "batch_stats": _ck["batch_stats"]},
                       int(_ck["latent_dim"]), float(_ck["beta"]),
                       amp=float(_ck["amp"])),
    int(_ck["latent_dim"]), "canonical vae_best/final")

CONFIGS = [
    ("vae64_40k_s2", 64, 0.5, 40000, 2),
    ("vae128_20k_s2", 128, 0.5, 20000, 2),
    ("vae64_20k_s5", 64, 0.5, 20000, 5),
]

results = {"canonical": baseline}
for tag, latent, beta, steps, seed in CONFIGS:
    cfg = VAETrainConfig(latent_dim=latent, beta=beta, steps=steps)
    state, _ = train_vae(jax.random.PRNGKey(seed), cfg,
                         log_every=5000,
                         log_fn=lambda m: print(
                             f"[{time.time()-t0:5.0f}s] {m}", flush=True))
    gen = make_vae_generator(state, latent, beta)
    m = score(gen, latent, tag)
    results[tag] = m
    if m < baseline:
        from quantized_spectrum_cartography_tpu.training import (
            save_checkpoint)
        save_checkpoint(f"/root/repo/checkpoints/{tag}/final", state)
        print(f"[{time.time()-t0:5.0f}s] saved checkpoints/{tag}/final "
              f"(beats canonical {baseline:.4f})", flush=True)

print("RESULTS", {k: round(v, 4) for k, v in results.items()}, flush=True)
