"""Attribute the seed-1 rho=1% miss-parity failure (round-5 robustness).

The seed-0 protocol passes every published row; a fresh 150-example draw
(seed 1) fails the rho=1% rows (dowjons 0.3116 vs 0.2688) while its
DeepComp control shifts +31% (0.283 -> 0.370) — the draw itself is
harder.  This tool runs rho=1% at seed 1 across stack variants to
attribute: if the round-4 stack (polish OFF) also fails, the failure is
Monte-Carlo draw difficulty, not the round-5 polish give-back.

Usage: python tools/missprob_seed_attrib.py [num_examples] [seed]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

t0 = time.time()


def log(*a):
    print(f"[{time.time()-t0:6.1f}s]", *a, flush=True)


log("backend:", jax.default_backend())

from quantized_spectrum_cartography_tpu.baselines import (
    BatchedHarness, condition_grid, load_pretrained_methods)
from quantized_spectrum_cartography_tpu.config import PhysicsConfig

NUM = int(sys.argv[1]) if len(sys.argv) > 1 else 150
SEED = int(sys.argv[2]) if len(sys.argv) > 2 else 1
VARIANTS = [
    ("round5_g0.75", dict(polish_ridge=0.1, polish_gamma=0.75)),
    ("round4_no_polish", dict(polish_ridge=0.0)),
    ("anchor_off_plain", dict(anchor_mu0=0.0, peak_refine=0,
                              backstop_frac=0.0, polish_ridge=0.0)),
]

conds = condition_grid("fraction", (0.01,))
results = {}
for vname, kw in VARIANTS:
    methods = load_pretrained_methods(
        only=("deepcomp", "nasdac", "dowjons"), **kw)
    h = BatchedHarness(methods, PhysicsConfig(), log_fn=None)
    out = h.run(conds, num_examples=NUM, seed=SEED)
    lab = conds[0].label()
    results[vname] = {}
    for m in methods:
        st = out[lab][m]
        results[vname][m] = {
            "sre": round(st["sre"], 4),
            "miss_prob": round(st["miss_prob"], 4),
            "false_prob": round(st["false_prob"], 4),
        }
        log(f"{vname:18s} {m:9s} sre {st['sre']:7.4f}  "
            f"miss {st['miss_prob']:.4f}  false {st['false_prob']:.4f}")

with open("/root/repo/MISSPROB_SEED_ATTRIB.json", "w") as f:
    json.dump({"num_examples": NUM, "seed": SEED, "rho": 0.01,
               "published": {"deepcomp": 0.5360, "nasdac": 0.2882,
                             "dowjons": 0.2688},
               "results": results,
               "wall_seconds": round(time.time() - t0, 1)}, f, indent=1)
log("wrote MISSPROB_SEED_ATTRIB.json")
