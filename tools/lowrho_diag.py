"""Diagnose the rho=1% miss gap: per-example miss concentration and
init-stage attribution for Nasdac / DowJons variants.

Questions:
- are misses spread thin (calibration) or concentrated in catastrophic
  examples (SPA separation failure / lost emitter)?
- does completing each band FIRST (DeepComp) and factoring the completed
  tensor fix the separation at 26 samples?
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


from quantized_spectrum_cartography_tpu.baselines import (
    BatchedHarness, condition_grid, load_pretrained_methods)
from quantized_spectrum_cartography_tpu.baselines.spa import nmf_spa
from quantized_spectrum_cartography_tpu.baselines.nnls import nnls_rows
from quantized_spectrum_cartography_tpu.config import PhysicsConfig
from quantized_spectrum_cartography_tpu.ops.lowrank import get_tensor
from quantized_spectrum_cartography_tpu.ops.metrics import (
    detection_counts, sre)
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

methods = load_pretrained_methods(only=("deepcomp", "nasdac", "dowjons"))
h = BatchedHarness(methods, PhysicsConfig(), log_fn=log)
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


def per_example_misses(T_hat):
    out = []
    for b in range(NUM):
        m, p, _, _ = detection_counts(jnp.asarray(T_hat[b]),
                                      jnp.asarray(T_noisy[b]), peaks[b])
        out.append((int(m), int(p)))
    return out


def report(name, T_hat):
    ms = per_example_misses(np.asarray(T_hat))
    miss = sum(m for m, _ in ms)
    tot = sum(p for _, p in ms)
    rates = np.asarray([m / max(p, 1) for m, p in ms])
    log(f"{name:26s} miss {miss}/{tot} = {miss/(tot+1):.4f}  "
        f"examples>50%missed: {(rates > 0.5).sum()}/{NUM}  "
        f"examples==0miss: {(rates == 0).sum()}/{NUM}")
    return miss, tot


# the standard methods
import zlib
for name, fn in methods.items():
    mkeys = jax.vmap(lambda k: jax.random.fold_in(
        k, zlib.crc32(name.encode()) % (2 ** 31)))(keys)
    marrs = {k: v for k, v in arrs.items() if k != "sample_idx"}
    res = h._method_batched(name, fn)(mkeys, marrs)
    report(name, res["T_hat"])

# complete-then-factor: AE-complete every band (DeepComp), then SPA+NNLS
# factorization of the completed tensor, refit C by NNLS on observed
def ctf(Om, T_obs, R):
    W = Om.astype(T_obs.dtype)
    T_comp = jax.vmap(lambda band: ae_complete(W, band))(T_obs)   # [K,I,J]
    _, S_flat = nmf_spa(T_comp.reshape(T_comp.shape[0], -1), R)
    S0 = S_flat.reshape(R, I, I)
    # per-emitter AE re-completion ("denoise" the separated factors on
    # the SLF manifold; dense input so mask = all-ones)
    ones = jnp.ones_like(W)
    S_hat = jnp.stack([ae_complete(ones, S0[r]) for r in range(R)])
    Wf = W.reshape(1, -1)
    design = (S_hat.reshape(R, -1) * Wf).T
    C_hat = nnls_rows(design, (T_obs * W[None]).reshape(
        T_obs.shape[0], -1), iters=200).T
    return get_tensor(S_hat, C_hat), S_hat, C_hat


# amplitude-normalized: S0 amplitude arbitrary from SPA -> rescale before AE
def ctf_norm(Om, T_obs, R):
    W = Om.astype(T_obs.dtype)
    T_comp = jax.vmap(lambda band: ae_complete(W, band))(T_obs)
    _, S_flat = nmf_spa(T_comp.reshape(T_comp.shape[0], -1), R)
    S0 = S_flat.reshape(R, I, I)
    rms = jnp.sqrt(jnp.mean(jnp.square(S0), axis=(1, 2), keepdims=True))
    S0n = S0 * ((1.0 / I) / jnp.maximum(rms, 1e-12))
    ones = jnp.ones_like(W)
    S_hat = jnp.stack([ae_complete(ones, S0n[r]) for r in range(R)])
    Wf = W.reshape(1, -1)
    design = (S_hat.reshape(R, -1) * Wf).T
    C_hat = nnls_rows(design, (T_obs * W[None]).reshape(
        T_obs.shape[0], -1), iters=200).T
    return get_tensor(S_hat, C_hat), S_hat, C_hat


# variant without per-emitter re-completion (keep raw separated factors)
def ctf_raw(Om, T_obs, R):
    W = Om.astype(T_obs.dtype)
    T_comp = jax.vmap(lambda band: ae_complete(W, band))(T_obs)
    _, S_flat = nmf_spa(T_comp.reshape(T_comp.shape[0], -1), R)
    S_hat = S_flat.reshape(R, I, I)
    Wf = W.reshape(1, -1)
    design = (S_hat.reshape(R, -1) * Wf).T
    C_hat = nnls_rows(design, (T_obs * W[None]).reshape(
        T_obs.shape[0], -1), iters=200).T
    return get_tensor(S_hat, C_hat), S_hat, C_hat


R = 2
for nm, f in [("ctf(recomplete)", ctf), ("ctf_norm", ctf_norm),
              ("ctf_raw", ctf_raw)]:
    fb = jax.jit(jax.vmap(lambda Om, T_obs: f(Om, T_obs, R)[0]))
    T_obs = arrs["T_noisy"] * arrs["Om"].astype(jnp.float32)[:, None]
    T_hat = fb(arrs["Om"], T_obs)
    s = float(jnp.mean(jax.vmap(sre)(T_hat, arrs["T_true"])))
    report(nm, np.asarray(T_hat))
    log(f"    {nm} mean sre {s:.4f}")
