"""Train candidate priors (long GAN, VAE) and score each by
prior-completion NMSE on held-out simulator SLFs (optimization.ipynb
cell 17/19 protocol) — the metric that predicts downstream recovery."""

import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

GAN_STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
VAE_STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 20000

t0 = time.time()
print("backend:", jax.default_backend(), flush=True)

from quantized_spectrum_cartography_tpu.config import PhysicsConfig
from quantized_spectrum_cartography_tpu.data.datasets import make_slf_sampler
from quantized_spectrum_cartography_tpu.ops.metrics import nmse
from quantized_spectrum_cartography_tpu.models import make_generator, VAE
from quantized_spectrum_cartography_tpu.solvers import (
    make_generator_apply, recover_masked_mse)
from quantized_spectrum_cartography_tpu.training import (
    GANTrainConfig, VAETrainConfig, train_gan, train_vae)

pcfg = PhysicsConfig()
sampler = make_slf_sampler(pcfg)
eval_slfs = sampler(jax.random.PRNGKey(999), 4)


def eval_prior(gen, z_dim, tag):
    errs = []
    for i in range(4):
        S_true = eval_slfs[i]
        mask = jax.random.bernoulli(jax.random.PRNGKey(50 + i), 0.2,
                                    S_true.shape).astype(jnp.float32)
        S_hat, _, _ = recover_masked_mse(
            jax.random.PRNGKey(60 + i), gen, mask, S_true * mask,
            z_dim=z_dim, num_global=300, num_local=200, adam_steps=400)
        errs.append(float(nmse(S_hat, S_true)))
    print(f"[{time.time()-t0:5.0f}s] {tag}: completion NMSE_S = "
          f"{np.round(errs, 4).tolist()} mean {np.mean(errs):.4f}",
          flush=True)
    return float(np.mean(errs))


# ---- long GAN ----------------------------------------------------------
cfg = GANTrainConfig(steps=GAN_STEPS, z_dim=256, batch_size=64)
gvars, gdiag = train_gan(
    jax.random.PRNGKey(1), cfg,
    checkpoint_dir="/root/repo/checkpoints/gan256_long",
    checkpoint_every=GAN_STEPS, log_every=max(GAN_STEPS // 10, 1),
    log_fn=lambda m: print(f"[{time.time()-t0:5.0f}s] {m}", flush=True))
g = make_generator(256)
raw = make_generator_apply(g, gvars)
gen_gan = lambda Z: raw(Z) / gdiag["scale"]
gan_score = eval_prior(gen_gan, 256, f"GAN-{GAN_STEPS}")

# ---- VAE ---------------------------------------------------------------
vcfg = VAETrainConfig(steps=VAE_STEPS, latent_dim=64, batch_size=64,
                      beta=0.5)
vvars, vdiag = train_vae(
    jax.random.PRNGKey(2), vcfg,
    checkpoint_dir="/root/repo/checkpoints/vae64",
    log_every=max(VAE_STEPS // 10, 1),
    log_fn=lambda m: print(f"[{time.time()-t0:5.0f}s] {m}", flush=True))
vae = VAE(latent_dim=64, beta=vcfg.beta)


def gen_vae(Z):
    out = vae.apply(vvars, Z, train=False, method=VAE.decode)
    return out[..., 0]  # trained on peak-normalized maps


# VAE was trained on peak-normalized targets; rescale to SLF amplitude
# via the mean peak of simulator maps (~0.26)
gen_vae_scaled = lambda Z: gen_vae(Z) * 0.26
vae_score = eval_prior(gen_vae_scaled, 64, f"VAE-{VAE_STEPS}")

print(f"SUMMARY: gan {gan_score:.4f} vae {vae_score:.4f}", flush=True)
print("DONE", flush=True)
