"""Linear-NMSE attack at the 2-bit headline config (round-2 VERDICT #4).

Sweeps the Frobenius penalties lambda_c = lambda_s below the reference's
100 (qmc.ipynb cell 1) and applies both the global-gain and the new
per-emitter gain recalibration, reporting linear NMSE and NMSE_LOG per
(lambda, seed).  Writes LAMBDA_SWEEP.json.

Context: the round-2 headline parity run (HEADLINE_PARITY.json) showed
the faithful torch reference lands at the same linear NMSE ~0.99 — this
sweep measures how much OUR solver can beat that by de-shrinking.

Usage: python tools/lambda_sweep_tpu.py [iters] [seeds]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 300
SEEDS = int(sys.argv[2]) if len(sys.argv) > 2 else 2

t0 = time.time()
print("backend:", jax.default_backend(), flush=True)

from quantized_spectrum_cartography_tpu.config import (
    PhysicsConfig, QuantizerConfig, SolverConfig)
from quantized_spectrum_cartography_tpu.ops import boundaries as B
from quantized_spectrum_cartography_tpu.ops.metrics import nmse, nmse_log
from quantized_spectrum_cartography_tpu.ops.quantizer import quantize_log
from quantized_spectrum_cartography_tpu.physics import (
    generate_onebit_problem, sample_entry_mask)
from quantized_spectrum_cartography_tpu.solvers import (
    make_vae_generator, recover_mle_gan)
from quantized_spectrum_cartography_tpu.solvers.calibrate import (
    recalibrate_gain, recalibrate_gains_per_emitter)
from quantized_spectrum_cartography_tpu.training import load_checkpoint

PCFG = PhysicsConfig()
ck = load_checkpoint("/root/repo/checkpoints/vae_best/final")
latent = int(ck["latent_dim"])
gen = make_vae_generator({"params": ck["params"],
                          "batch_stats": ck["batch_stats"]},
                         latent, float(ck["beta"]), amp=float(ck["amp"]))

bbt = B.QUANTIZATION_BOUNDARIES_4_BINS
offset, sigma = B.LOG_OFFSET_4, 5.0
bb = jnp.asarray(np.array(bbt), jnp.float32)
qcfg = QuantizerConfig(boundaries=tuple(bbt), noise_std=sigma,
                       log_offset=offset)

LAMBDAS = (100.0, 10.0, 1.0, 0.1)
rows = []
for seed in range(SEEDS):
    prob = generate_onebit_problem(jax.random.PRNGKey(100 + seed), PCFG, 0.1)
    Y = quantize_log(jax.random.PRNGKey(200 + seed), prob.T_true, sigma,
                     bb, offset)
    mask = sample_entry_mask(jax.random.PRNGKey(300 + seed), Y.shape, 0.1)
    for lam in LAMBDAS:
        scfg = SolverConfig(max_iters=ITERS, z_search_global=200,
                            z_search_local=200, z_dim=latent,
                            lambda_c=lam, lambda_s=lam)
        res = recover_mle_gan(jax.random.PRNGKey(400 + seed), Y, mask, gen,
                              scfg, qcfg, T_true=prob.T_true)
        gam, T_g = recalibrate_gain(res.T_hat, Y, bb, sigma, offset, mask)
        gains, T_pe = recalibrate_gains_per_emitter(
            res.S, res.C, Y, bb, sigma, offset, mask)
        row = {
            "seed": seed, "lambda": lam,
            "nmse_raw": float(nmse(res.T_hat, prob.T_true)),
            "nmse_globalcal": float(nmse(T_g, prob.T_true)),
            "nmse_percal": float(nmse(T_pe, prob.T_true)),
            "nmse_log_raw": float(nmse_log(jnp.maximum(res.T_hat, 0),
                                           prob.T_true, offset)),
            "nmse_log_percal": float(nmse_log(jnp.maximum(T_pe, 0),
                                              prob.T_true, offset)),
            "gamma": float(gam),
            "gains": np.asarray(gains).tolist(),
        }
        rows.append(row)
        print(f"[{time.time()-t0:5.0f}s] seed{seed} lam={lam}: "
              f"NMSE {row['nmse_raw']:.3f} -> g {row['nmse_globalcal']:.3f}"
              f" -> pe {row['nmse_percal']:.3f} | LOG "
              f"{row['nmse_log_raw']:.3f} -> {row['nmse_log_percal']:.3f}",
              flush=True)

best = min(rows, key=lambda r: r["nmse_percal"])
summary = {"config": "2-bit sigma=5 f=0.1 (headline)", "iters": ITERS,
           "rows": rows,
           "best": {"lambda": best["lambda"],
                    "nmse_percal": best["nmse_percal"]}}
with open("/root/repo/LAMBDA_SWEEP.json", "w") as f:
    json.dump(summary, f, indent=1)
print(json.dumps(summary["best"]), flush=True)
print("DONE", flush=True)
