"""Headline 2-bit recovery with the trained VAE decoder as deep prior,
plus a VAE hyperparameter sweep scored by prior-completion NMSE."""

import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

t0 = time.time()
print("backend:", jax.default_backend(), flush=True)

from quantized_spectrum_cartography_tpu.config import (
    PhysicsConfig, QuantizerConfig, SolverConfig)
from quantized_spectrum_cartography_tpu.data.datasets import make_slf_sampler
from quantized_spectrum_cartography_tpu.ops import boundaries as B
from quantized_spectrum_cartography_tpu.ops.metrics import nmse
from quantized_spectrum_cartography_tpu.ops.quantizer import quantize_log
from quantized_spectrum_cartography_tpu.physics import (
    generate_onebit_problem, sample_entry_mask)
from quantized_spectrum_cartography_tpu.models import VAE
from quantized_spectrum_cartography_tpu.solvers import (
    recover_masked_mse, recover_mle_gan)
from quantized_spectrum_cartography_tpu.training import (
    VAETrainConfig, train_vae, load_checkpoint)

PCFG = PhysicsConfig()
sampler = make_slf_sampler(PCFG)
eval_slfs = sampler(jax.random.PRNGKey(999), 4)


def make_vae_gen(vvars, latent, beta, amp=0.26):
    vae = VAE(latent_dim=latent, beta=beta)

    def gen(Z):
        return vae.apply(vvars, Z, train=False, method=VAE.decode)[..., 0] * amp

    return gen


def completion_score(gen, z_dim, tag):
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
    print(f"[{time.time()-t0:5.0f}s] {tag}: completion NMSE_S mean {m:.4f} "
          f"{np.round(errs,4).tolist()}", flush=True)
    return m


def headline(gen, z_dim, tag, sigma=5.0, iters=500):
    prob = generate_onebit_problem(jax.random.PRNGKey(2), PCFG, 0.1)
    qcfg = QuantizerConfig(boundaries=B.QUANTIZATION_BOUNDARIES_4_BINS,
                           noise_std=sigma, log_offset=B.LOG_OFFSET_4)
    Y = quantize_log(jax.random.PRNGKey(3), prob.T_true, sigma,
                     jnp.asarray(np.array(qcfg.boundaries)), qcfg.log_offset)
    mask = sample_entry_mask(jax.random.PRNGKey(4), Y.shape, 0.1)
    scfg = SolverConfig(max_iters=iters, z_search_global=200,
                        z_search_local=200, z_dim=z_dim)
    res = recover_mle_gan(jax.random.PRNGKey(5), Y, mask, gen, scfg, qcfg,
                          T_true=prob.T_true)
    nm = np.asarray(res.nmses)
    print(f"[{time.time()-t0:5.0f}s] {tag} headline 2-bit: final "
          f"{nm[-1]:.4f} best {nm.min():.4f} @100 {nm[99]:.4f}", flush=True)
    return nm.min()


# ---- current vae64 checkpoint ------------------------------------------
vvars = load_checkpoint("/root/repo/checkpoints/vae64/final")
gen64 = make_vae_gen(vvars, 64, 0.5)
headline(gen64, 64, "vae64-b0.5")

# ---- sweep: latent/beta/steps ------------------------------------------
best = (None, 1e9, None, None)
for latent, beta, steps in [(64, 0.25, 40000), (128, 0.5, 40000),
                            (128, 0.25, 40000)]:
    cfg = VAETrainConfig(latent_dim=latent, beta=beta, steps=steps,
                         batch_size=64)
    vv, _ = train_vae(jax.random.PRNGKey(3), cfg,
                      log_every=steps, log_fn=lambda m: None)
    gen = make_vae_gen(vv, latent, beta)
    score = completion_score(gen, latent, f"vae{latent}-b{beta}-{steps}")
    if score < best[1]:
        best = (gen, score, latent, (vv, beta))

gen_best, score_best, latent_best, (vv_best, beta_best) = best
print(f"[{time.time()-t0:5.0f}s] best sweep: latent={latent_best} "
      f"beta={beta_best} score={score_best:.4f}", flush=True)
headline(gen_best, latent_best, f"best-vae{latent_best}")

from quantized_spectrum_cartography_tpu.training.checkpoints import (
    save_checkpoint)
save_checkpoint("/root/repo/checkpoints/vae_best/final",
                {**vv_best, "latent_dim": jnp.int32(latent_best),
                 "beta": jnp.float32(beta_best), "amp": jnp.float32(0.26)})
print("saved checkpoints/vae_best/final", flush=True)
print("DONE", flush=True)
