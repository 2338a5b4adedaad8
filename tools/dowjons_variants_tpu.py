"""Compare DowJons S-step variants on the published miss-detection
protocol.

The reference's committed harness runs DowJons with `use_gan=false`
(`joint_opt_ae.m:29`), dispatching the S-step to
`nn_descent_ae.run_descent_ae` — Adam on the completion AE's LATENT code
through the frozen decoder — not to the GAN inversion.  Round 3's
published-curve run used our VAE-inversion variant and sat above the
published DowJons curve at rho <= 5%; this tool measures all available
variants side by side at the published rhos so the registry default is
chosen by data.

Usage: python tools/dowjons_variants_tpu.py [num_examples] [rhos...]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

t0 = time.time()


def log(*a):
    print(f"[{time.time()-t0:6.1f}s]", *a, flush=True)


log("backend:", jax.default_backend())

from quantized_spectrum_cartography_tpu.baselines import (
    BatchedHarness, condition_grid, load_pretrained_methods)
from quantized_spectrum_cartography_tpu.config import PhysicsConfig

PUBLISHED_DOWJONS = {0.01: 0.2688, 0.025: 0.0952, 0.05: 0.0292,
                     0.075: 0.0038, 0.10: 0.0007}

NUM = int(sys.argv[1]) if len(sys.argv) > 1 else 50
RHOS = tuple(float(x) for x in sys.argv[2:]) or (0.01, 0.025, 0.05, 0.075,
                                                 0.10)

methods = load_pretrained_methods(
    only=("dowjons", "dowjons_ae_latent", "nasdac"))  # "dowjons" == the
# gan variant (standard_methods pops the aliased variant key, so the gan
# path is reachable only under its canonical name)
log("methods:", list(methods))

harness = BatchedHarness(methods, PhysicsConfig(), log_fn=log)
conds = condition_grid("fraction", RHOS)
out = harness.run(conds, num_examples=NUM, seed=0)

results = {m: {} for m in methods}
for cond in conds:
    for m in methods:
        st = out[cond.label()][m]
        results[m][cond.fraction] = {
            "miss_prob": st["miss_prob"], "miss": st["miss_count"],
            "peaks": st["peak_count"], "sre": st["sre"]}

log("=== summary (miss_prob; published DowJons in parens) ===")
for m in methods:
    row = " ".join(
        f"{rho:g}%:{results[m][rho]['miss_prob']:.4f}"
        f"({PUBLISHED_DOWJONS[rho]:.4f})" for rho in RHOS)
    log(f"{m:18s} {row}")
    row2 = " ".join(f"{rho:g}%:sre={results[m][rho]['sre']:.3f}"
                    for rho in RHOS)
    log(f"{'':18s} {row2}")

with open("/root/repo/DOWJONS_VARIANTS.json", "w") as f:
    json.dump({"num_examples": NUM, "rhos": list(RHOS),
               "published_dowjons": PUBLISHED_DOWJONS,
               "results": results,
               "wall_seconds": time.time() - t0}, f, indent=1, default=str)
log("wrote DOWJONS_VARIANTS.json")
