"""Five-method SRE table at the reference's published-figure config —
64 Monte-Carlo examples with mean / median / trimmed mean.

The only external SRE anchors in the reference are the single-example
figure titles at `backup/algorithms/joint_opt_ae.m:605-645`
(R=2, shadow_sigma=5, Xc=50, f=0.05, sinc basis, noiseless):

    DowJons 0.3163 | Nasdac 1.1751 | DeepComp 0.4201 | LL1 1.2288 | TPS 1.9181

Round 3 ran 16 examples and disclosed DeepComp's mean (0.5022) as
inflated by 2/16 outlier draws; VERDICT task 9 asks whether that is a
tail property of the completion (expect: heavy right tail, median and
trimmed mean far below the published anchor) or a fixable failure.  This
run quadruples the sample and reports mean, median, 12.5%-trimmed mean,
and the sorted per-example SREs for every method.

Usage: python tools/published_sre_tpu.py [num_examples]
"""

import json
import os
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

NUM = int(sys.argv[1]) if len(sys.argv) > 1 else 64

PUBLISHED = {"dowjons": 0.3163, "nasdac": 1.1751, "deepcomp": 0.4201,
             "btd": 1.2288, "tps": 1.9181}
CAVEATS = {
    "dowjons": "VAE decoder prior (measured stronger than our SNGAN at "
               "equal budget) instead of the reference's SNGAN; joint "
               "NNLS + latent-descent alternation with SPA/AE-seeded "
               "multi-restart init; completion anchor inactive at f=0.05",
    "nasdac": "same SPA + AE completion pipeline, retrained AE; C refit "
              "by NNLS on the completed SLFs (upgrade over the "
              "reference's SPA pseudo-inverse C); anchor inactive at "
              "f=0.05",
    "deepcomp": "same per-band AE completion algorithm; the completion "
                "AE is retrained from scratch on simulator data "
                "(training/ae_trainer.py) — the reference ships weights "
                "without a training script",
    "btd": "validity-capped mean (SRE<3, joint_opt_ae.m:496-501), "
           "matching the reference's count_valid accumulation",
    "tps": "different implementation: `full_tps` was never shipped; "
           "baselines/tps.py is a proper thin-plate-spline completer",
}

from quantized_spectrum_cartography_tpu.baselines import pretrained

methods = load_pretrained_methods(
    only=("tps", "btd", "deepcomp", "nasdac", "dowjons"))
harness = BatchedHarness(methods, PhysicsConfig(), log_fn=log)
out = harness.run(condition_grid(), num_examples=NUM, seed=0)
(label, per_method), = out.items()

table = {}
for name, st in per_method.items():
    pub = PUBLISHED.get(name)
    sres = np.sort(np.asarray(st["sre_all"]))
    cap = 3.0 if name == "btd" else None
    valid = sres[sres < cap] if cap else sres
    # symmetric 12.5%-per-tail trim (a conventional trimmed mean; the
    # round-4 one-sided trim dropped only the k largest values, which
    # biases the statistic low — ADVICE.md round 4)
    k = max(1, int(round(0.125 * valid.size)))
    trimmed = float(valid[k:-k].mean()) if valid.size > 2 * k else float(
        valid.mean())
    row = {
        "published_sre": pub,
        "sre_mean": round(float(valid.mean()), 4),
        "sre_median": round(float(np.median(valid)), 4),
        "sre_trimmed_mean_12.5pct_each_tail": round(trimmed, 4),
        "valid": int(valid.size),
        "nae_s": (round(st["nae_s"], 4) if st["nae_s"] == st["nae_s"]
                  else None),
        "nae_c": (round(st["nae_c"], 4) if st["nae_c"] == st["nae_c"]
                  else None),
        "miss_prob": round(st["miss_prob"], 4),
        "false_prob": round(st["false_prob"], 4),
        "sre_sorted": [round(float(v), 3) for v in sres],
        "beats_published_mean": bool(valid.mean() < pub),
        "beats_published_median": bool(np.median(valid) < pub),
        "beats_published_trimmed": bool(trimmed < pub),
        "caveat": CAVEATS.get(name, ""),
    }
    table[name] = row
    log(f"{name:9s} mean {row['sre_mean']:.4f} med {row['sre_median']:.4f} "
        f"trim {row['sre_trimmed_mean_12.5pct_each_tail']:.4f} "
        f"(published {pub})  valid {row['valid']}/{NUM}")

with open("/root/repo/PUBLISHED_SRE.json", "w") as f:
    json.dump({
        "protocol": "base condition f=0.05 R=2 sigma=5 Xc=50 noiseless "
                    f"(joint_opt_ae.m:12-28), {NUM} vmapped Monte-Carlo "
                    "examples (seed 0), BatchedHarness; published "
                    "anchors are the reference's SINGLE-example figure "
                    "titles (joint_opt_ae.m:605-645), so medians / "
                    "trimmed means are the fairer comparison and all "
                    "three statistics are reported with the full sorted "
                    "per-example SREs",
        # provenance derived from the registry's own constants so the
        # artifact always names the checkpoints that actually ran
        # (ADVICE.md round 4: a hardcoded string here went stale when
        # the default prior moved to vae_peak_z256)
        "config": {
            "ae_checkpoint": os.path.relpath(pretrained.AE_CKPT,
                                             "/root/repo"),
            "vae_checkpoint": os.path.relpath(pretrained.VAE_CKPT,
                                              "/root/repo"),
            "dowjons_variant": "gan", "dowjons_iters": 30,
            "dowjons_restarts": 4, "anchor_mu0": 0.3,
            "seed": 0,
        },
        "num_examples": NUM,
        "methods": table,
        "wall_seconds": round(time.time() - t0, 1),
    }, f, indent=1)
log("wrote PUBLISHED_SRE.json")
