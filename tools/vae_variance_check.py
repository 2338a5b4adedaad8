"""Isolate VAE prior quality variance: seed x steps, plus re-score of the
saved vae64/final checkpoint."""

import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

t0 = time.time()
print("backend:", jax.default_backend(), flush=True)

from quantized_spectrum_cartography_tpu.config import PhysicsConfig
from quantized_spectrum_cartography_tpu.training import VAETrainConfig
from quantized_spectrum_cartography_tpu.data.datasets import make_slf_sampler
from quantized_spectrum_cartography_tpu.ops.metrics import nmse
from quantized_spectrum_cartography_tpu.solvers import (
    make_vae_generator, recover_masked_mse)
from quantized_spectrum_cartography_tpu.training import (
    load_checkpoint, train_vae)

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
    print(f"[{time.time()-t0:5.0f}s] {tag}: mean {np.mean(errs):.4f} "
          f"{np.round(errs,4).tolist()}", flush=True)
    return float(np.mean(errs))


saved = load_checkpoint("/root/repo/checkpoints/vae64/final")
score(make_vae_generator(saved, 64, 0.5), 64, "saved vae64/final (expect 0.20)")

for key, steps in [(2, 20000), (3, 20000), (2, 40000)]:
    cfg = VAETrainConfig(latent_dim=64, beta=0.5, steps=steps, batch_size=64)
    vv, _ = train_vae(jax.random.PRNGKey(key), cfg,
                      log_every=steps, log_fn=lambda m: None)
    score(make_vae_generator(vv, 64, 0.5), 64, f"key{key}-{steps}")
print("DONE", flush=True)
