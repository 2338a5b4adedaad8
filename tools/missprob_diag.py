"""Diagnose the miss-detection gap: at each rho, what does the
T_hat/T_ref ratio distribution at peak events look like per method?

Misses are events with ratio < 0.25.  If the published curves decay to
~1e-2..1e-3 and ours plateau, the question is whether our misses are
marginal (ratio 0.15-0.25 — a calibration/sharpness issue) or
catastrophic (ratio ~0 — a wrong-structure issue), and whether they
concentrate at small reference peak values (bands where the emitter is
quiet and peak_value barely clears the 0.01 gate).
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
from quantized_spectrum_cartography_tpu.config import PhysicsConfig
from quantized_spectrum_cartography_tpu.physics.shadowing import (
    correlation_cholesky)
import zlib
import dataclasses

NUM = 32
RHO = float(sys.argv[1]) if len(sys.argv) > 1 else 0.10

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

peaks = np.asarray(arrs["peaks"])          # [B, R, 2] (x, y)
T_noisy = np.asarray(arrs["T_noisy"])      # [B, K, I, J]
Bn, K = T_noisy.shape[:2]

px = np.clip(np.round(peaks[..., 0]).astype(int), 0, I - 1)
py = np.clip(np.round(peaks[..., 1]).astype(int), 0, I - 1)

for name, fn in methods.items():
    mkeys = jax.vmap(lambda k: jax.random.fold_in(
        k, zlib.crc32(name.encode()) % (2 ** 31)))(keys)
    marrs = {k: v for k, v in arrs.items() if k != "sample_idx"}
    res = h._method_batched(name, fn)(mkeys, marrs)
    T_hat = np.asarray(res["T_hat"])
    ratios, refs = [], []
    for b in range(Bn):
        rv = T_noisy[b][:, py[b], px[b]]       # [K, R]
        hv = T_hat[b][:, py[b], px[b]]
        m = rv > 0.01
        ratios.append((hv[m] / rv[m]))
        refs.append(rv[m])
    ratios = np.concatenate(ratios)
    refs = np.concatenate(refs)
    miss = ratios < 0.25
    log(f"--- {name}: {ratios.size} peak events, miss rate "
        f"{miss.mean():.4f}")
    qs = np.percentile(ratios, [1, 5, 10, 25, 50, 75, 90])
    log(f"    ratio pct [1,5,10,25,50,75,90]: "
        + " ".join(f"{q:.3f}" for q in qs))
    if miss.any():
        log(f"    missed events: ratio median {np.median(ratios[miss]):.3f}"
            f", ref median {np.median(refs[miss]):.4f} "
            f"(all-events ref median {np.median(refs):.4f})")
        # how many misses are at refs barely above the 0.01 gate?
        small = refs[miss] < 0.03
        log(f"    misses with ref<0.03: {small.mean():.2%}; "
            f"ratio<0.1 (catastrophic): "
            f"{(ratios[miss] < 0.1).mean():.2%}")
    # global scale check: best single multiplier at peaks
    log(f"    scale check: median ratio {np.median(ratios):.3f} "
        f"(1.0 = calibrated)")
