"""The full five-axis condition grid (`joint_opt_ae.m:11-25, 82-117`),
all five published methods, through the batched harness.

25 conditions (fraction / R / shadow / Xc / SNR axes, 5 values each — the
base condition f=0.05, R=2, sigma=5, Xc=50, noiseless appears as the
middle of every axis), 16 vmapped Monte-Carlo examples per condition.
The base-condition row doubles as the upgraded published-SRE table
(>= 10 examples, VERDICT task 10).

Writes CONDITIONS.json incrementally (one dump per condition) with
per-condition execute times split from compile time: the batched harness
compiles one generator program per R, one program per non-TPS method per
R, and one TPS program per observed-count N — everything else is reuse.
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

NUM_EXAMPLES = int(sys.argv[1]) if len(sys.argv) > 1 else 16
OUT = "/root/repo/CONDITIONS.json"

# published single-example SRE anchors for the base condition
# (joint_opt_ae.m:605-645 figure titles)
PUBLISHED_BASE = {"dowjons": 0.3163, "nasdac": 1.1751, "deepcomp": 0.4201,
                  "btd": 1.2288, "tps": 1.9181}

methods = load_pretrained_methods()
log("methods:", list(methods))
harness = BatchedHarness(methods, PhysicsConfig(), log_fn=log)

axes = ("fraction", "num_emitters", "shadow_sigma", "xc", "snr")
results = {}
timings = {}
for axis in axes:
    conds = condition_grid(axis)
    for cond in conds:
        label = cond.label()
        if label in results:        # base condition repeats across axes
            continue
        t_c = time.time()
        out = harness.run((cond,), num_examples=NUM_EXAMPLES,
                          seed=0)
        results[label] = out[label]
        timings[label] = time.time() - t_c
        log(f"condition done in {timings[label]:.1f}s: {label}")
        with open(OUT, "w") as f:
            json.dump({
                "num_examples": NUM_EXAMPLES,
                "axes": {a: list(condition_grid(a)[i].label()
                                 for i in range(5)) for a in axes},
                "results": results,
                "per_condition_wall_seconds": timings,
                "total_wall_seconds": time.time() - t0,
                "published_base_sre": PUBLISHED_BASE,
                "notes": "base condition (f=0.05 R=2 sig=5.0 Xc=50.0 "
                         "snr=None) is the published-figure config; "
                         "per-condition wall includes first-use compiles "
                         "(~60-150s/program through the axon tunnel); "
                         "repeat conditions reuse programs and run in "
                         "seconds.",
            }, f, indent=1)

# summary: base condition vs published
base_label = "f=0.05 R=2 sig=5.0 Xc=50.0 snr=None"
if base_label in results:
    log("=== base condition (published-figure config) ===")
    for m, pub in PUBLISHED_BASE.items():
        st = results[base_label][m]
        log(f"{m:9s} SRE {st['sre']:.4f} (published {pub})  "
            f"nae_s {st['nae_s']:.3f} nae_c {st['nae_c']:.3f} "
            f"miss {st['miss_prob']:.4f} false {st['false_prob']:.4f} "
            f"valid {st['valid']}")
total = time.time() - t0
exec_time = sum(sorted(timings.values())[:-8])  # drop the 8 compile-heavy
log(f"grid complete: {len(results)} conditions, {total:.0f}s total; "
    f"steady-state (excl. compile-heavy first-use conditions): "
    f"{exec_time:.0f}s")
