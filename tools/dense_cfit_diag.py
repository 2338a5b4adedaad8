"""Test the completion-anchored C fit at rho=1%.

Hypothesis: the catastrophic low-rho miss mode is the C-step NNLS over
26 observed locations — when no sample lands where an emitter's SLF has
mass, the [N_obs, R] design is ill-conditioned and NNLS zeroes that
emitter's PSD, losing every one of its peak events even when S_hat is
fine.  Anchoring the fit with the per-band AE completion at unobserved
entries (observed entries keep the real data) reconditions the design.
"""

import sys
import time
import zlib

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

t0 = time.time()


def log(*a):
    print(f"[{time.time()-t0:6.1f}s]", *a, flush=True)


from quantized_spectrum_cartography_tpu.baselines import (
    BatchedHarness, condition_grid, load_pretrained_methods)
from quantized_spectrum_cartography_tpu.baselines.spa import nmf_spa
from quantized_spectrum_cartography_tpu.baselines.nnls import nnls_rows
from quantized_spectrum_cartography_tpu.config import PhysicsConfig
from quantized_spectrum_cartography_tpu.ops.lowrank import get_tensor
from quantized_spectrum_cartography_tpu.ops.metrics import detection_counts
from quantized_spectrum_cartography_tpu.physics.shadowing import (
    correlation_cholesky)
from quantized_spectrum_cartography_tpu.training import load_checkpoint
from quantized_spectrum_cartography_tpu.training.ae_trainer import (
    make_ae_completer)
from quantized_spectrum_cartography_tpu.models import Autoencoder
from quantized_spectrum_cartography_tpu.baselines.pretrained import AE_CKPT

NUM = 50
RHO = float(sys.argv[1]) if len(sys.argv) > 1 else 0.01

state = dict(load_checkpoint(AE_CKPT))
scale = float(state.pop("scale"))
ae_model = Autoencoder(activation="selu")
ae_complete = make_ae_completer(ae_model, state, scale)

h = BatchedHarness({}, PhysicsConfig())
cond = condition_grid("fraction", (RHO,))[0]
I = h.physics.grid_size
num = int(round(cond.fraction * I * I))
genf = h._problem_gen(cond.num_emitters)
chol = jnp.asarray(correlation_cholesky(I, float(cond.xc)))
keys = jax.random.split(jax.random.PRNGKey(0), NUM)
arrs = dict(genf(keys, chol, jnp.float32(cond.shadow_sigma),
                 jnp.float32(0.0), jnp.int32(num)))
T_noisy = np.asarray(arrs["T_noisy"])
peaks = arrs["peaks"]
R = 2


def report(name, T_hat):
    miss = tot = 0
    cat = []
    for b in range(NUM):
        m, p, _, _ = detection_counts(jnp.asarray(T_hat[b]),
                                      jnp.asarray(T_noisy[b]),
                                      peaks[b])
        miss += int(m); tot += int(p)
        cat.append(int(m) / max(int(p), 1))
    cat = np.asarray(cat)
    log(f"{name:30s} miss {miss}/{tot} = {miss/(tot+1):.4f} "
        f">50%: {(cat > 0.5).sum()}/{NUM} zero: {(cat == 0).sum()}/{NUM}")


def nasdac_variant(Om, T_obs, mu, dense_s_init):
    """Nasdac with completion-anchored C fit.

    mu: weight of completed entries in the C NNLS (0 = current nasdac).
    dense_s_init: complete S inputs from per-band-completed tensor instead
    of raw masked SPA columns."""
    W = Om.astype(T_obs.dtype)
    K = T_obs.shape[0]
    Tf = (T_obs * W[None]).reshape(K, -1)
    T_comp = jax.vmap(lambda band: ae_complete(W, band))(T_obs)
    if dense_s_init:
        _, S_flat = nmf_spa(T_comp.reshape(K, -1), R)
        rms = jnp.sqrt(jnp.mean(jnp.square(S_flat), 1, keepdims=True))
        S0 = (S_flat * ((1.0 / I) / jnp.maximum(rms, 1e-12))).reshape(
            R, I, I)
        ones = jnp.ones_like(W)
        S_hat = jnp.stack([ae_complete(ones, S0[r]) for r in range(R)])
    else:
        _, S_flat = nmf_spa(Tf, R)
        S0 = S_flat.reshape(R, I, I)
        S_hat = jnp.stack([ae_complete(W, S0[r]) for r in range(R)])
    # C fit: observed entries weight 1, completed entries weight mu
    Wc = W[None] + mu * (1.0 - W[None])                     # [1, I, J]
    T_fit = T_obs * W[None] + T_comp * (1.0 - W[None])
    Wf = jnp.sqrt(Wc).reshape(1, -1)
    design = (S_hat.reshape(R, -1) * Wf).T
    C = nnls_rows(design, (T_fit.reshape(K, -1) * Wf), iters=200).T
    return get_tensor(S_hat, C)


def nasdac_gated(Om, T_obs, mu0, tau):
    """Anchor gated by per-emitter observed-energy fraction: for each
    completed emitter SLF, s_r = sum_obs(S_r^2) / (f * sum(S_r^2)) ~ 1
    when sampling covers its support, << 1 when the design cannot
    identify its amplitude.  The anchor turns on only then."""
    W = Om.astype(T_obs.dtype)
    K = T_obs.shape[0]
    f_hat = jnp.sum(W) / W.size
    Tf = (T_obs * W[None]).reshape(K, -1)
    T_comp = jax.vmap(lambda band: ae_complete(W, band))(T_obs)
    _, S_flat = nmf_spa(Tf, R)
    S0 = S_flat.reshape(R, I, I)
    S_hat = jnp.stack([ae_complete(W, S0[r]) for r in range(R)])
    obs_frac = jnp.sum(jnp.square(S_hat) * W[None], axis=(1, 2)) / (
        f_hat * jnp.maximum(jnp.sum(jnp.square(S_hat), axis=(1, 2)),
                            1e-12))
    mu = jnp.where(jnp.min(obs_frac) < tau, mu0, 0.0)
    Wc = W[None] + mu * (1.0 - W[None])
    T_fit = T_obs * W[None] + T_comp * (1.0 - W[None])
    Wf = jnp.sqrt(Wc).reshape(1, -1)
    design = (S_hat.reshape(R, -1) * Wf).T
    C = nnls_rows(design, (T_fit.reshape(K, -1) * Wf), iters=200).T
    return get_tensor(S_hat, C)


T_obs = arrs["T_noisy"] * arrs["Om"].astype(jnp.float32)[:, None]
for tag, mu in [("mu=0", 0.0), ("mu=0.3", 0.3)]:
    fb = jax.jit(jax.vmap(lambda Om, T: nasdac_variant(Om, T, mu, False)))
    Th = np.asarray(fb(arrs["Om"], T_obs))
    report(f"nasdac {tag}", Th)
for tau in (0.3, 0.5, 0.7):
    fb = jax.jit(jax.vmap(lambda Om, T: nasdac_gated(Om, T, 0.3, tau)))
    Th = np.asarray(fb(arrs["Om"], T_obs))
    report(f"nasdac gated tau={tau}", Th)
