"""Published miss-detection-probability curves — the last unmatched
BASELINE.md anchors.

The reference publishes miss probabilities at rho = [1, 2.5, 5, 7.5, 10]%
sampling for DeepComp, Nasdac, and DowJons
(`backup/algorithms/joint_opt_ae.m:998-1004`), aggregated over
Monte-Carlo examples with the exact event rules at `:514-544` and the
(total+1) denominators at `:549-554`.  This tool runs the same protocol
through the batched harness (50 vmapped examples per rho -> 6400
peak-candidate events per point at R=2, K=64) and writes MISSPROB.json
with our three curves next to the published rows.

Usage: PYTHONPATH defaults fine (script inserts /root/repo). ~6 compiled
programs total; minutes on the chip after compiles.
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

# joint_opt_ae.m:998-1004 — the published miss-probability rows
PUBLISHED = {
    "deepcomp": [0.5360, 0.2554, 0.0977, 0.0244, 0.0213],
    "nasdac":   [0.2882, 0.1115, 0.0262, 0.0089, 0.0069],
    "dowjons":  [0.2688, 0.0952, 0.0292, 0.0038, 0.0007],
}
RHOS = (0.01, 0.025, 0.05, 0.075, 0.10)
NUM_EXAMPLES = int(sys.argv[1]) if len(sys.argv) > 1 else 50

# pinned solver configuration (every knob that shapes the curves); the
# same dict is recorded in MISSPROB.json so the run is reproducible from
# the artifact alone
CONFIG = {
    "ae_checkpoint": "checkpoints/ae_completion/final (scale 2.5, "
                     "peak-weighted MSE retrain, AE_RETRAIN.json)",
    "vae_checkpoint": "checkpoints/vae_peak_z256 (round-4 softplus/z256 prior)",
    "dowjons_variant": "gan (use_gan=true path with the VAE prior; "
                       "anchored objective)",
    "dowjons_iters": 30,
    "dowjons_restarts": 4,
    "dowjons_z_steps_per_iter": 20,
    "anchor_mu0": 0.3,
    "anchor_schedule": "mu = mu0 * clip(1 - f/0.05, 0, 1) "
                       "(solvers/nasdac.anchor_weight)",
    # round 5: peak-gated observed-entry C polish ON (ridge 0.1 toward
    # the anchored C; per-band blend guarantees witnessed peaks keep
    # >= gamma of their anchored render — GATED_POLISH_DIAG*.json).
    # Recovers inversion-class SRE at rho=1% (1.22 -> ~0.9) and cuts
    # false alarms (0.083 -> ~0.05) at a measured miss give-back well
    # inside the published margin.
    "c_polish_ridge_rel": 0.1,
    "c_polish_gamma": float(os.environ.get("QSC_POLISH_GAMMA", "0.75")),
    "c_polish_peaks_extra": int(os.environ.get("QSC_POLISH_PEAKS", "2")),
    "backstop_frac": 0.5,
    "peak_refine_patches": 2,
    "witness": "completion-witnessed anchored nasdac + pointwise no-extinguish backstop + residual peak refine",
    "nnls_iters": 100,
    "seed": int(os.environ.get("QSC_SEED", "0")),
}
_polish_kw = dict(
    polish_ridge=CONFIG["c_polish_ridge_rel"],
    polish_gamma=CONFIG["c_polish_gamma"],
    polish_peaks_extra=CONFIG["c_polish_peaks_extra"],
)
_vae_ckpt = os.environ.get("QSC_VAE_CKPT")
if _vae_ckpt:
    CONFIG["vae_checkpoint"] = _vae_ckpt
    methods = load_pretrained_methods(
        vae_ckpt=_vae_ckpt, only=("deepcomp", "nasdac", "dowjons"),
        **_polish_kw)
else:
    methods = load_pretrained_methods(only=("deepcomp", "nasdac",
                                            "dowjons"), **_polish_kw)
log("methods:", list(methods))

harness = BatchedHarness(methods, PhysicsConfig(), log_fn=log)
conds = condition_grid("fraction", RHOS)
out = harness.run(conds, num_examples=NUM_EXAMPLES,
                  seed=CONFIG["seed"])
wall = time.time() - t0

curves = {m: [] for m in methods}
events = {m: [] for m in methods}
for cond in conds:
    for m in methods:
        st = out[cond.label()][m]
        curves[m].append(st["miss_prob"])
        events[m].append({"miss": st["miss_count"], "peaks": st["peak_count"],
                          "false": st["false_count"], "lows": st["low_count"],
                          "sre": st["sre"]})

log(f"total wall {wall:.1f}s")
all_pass = True
for m in methods:
    ours = np.asarray(curves[m])
    pub = np.asarray(PUBLISHED[m])
    ok = bool(np.all(ours <= pub + 1e-9))
    all_pass &= ok
    log(f"{m:9s} ours  " + " ".join(f"{v:.4f}" for v in ours))
    log(f"{m:9s} publ  " + " ".join(f"{v:.4f}" for v in pub)
        + ("  <= published at every rho: PASS" if ok else "  FAIL"))

# False-alarm guard as an explicit CRITERION (round-4 VERDICT item 4):
# a factored method must not buy miss parity by inflating renders —
# bound its false-detect rate at every rho by
#     max(FALSE_RATIO x completion, completion + FALSE_ABS)
# against the pure per-band completion baseline (DeepComp).  The
# reference publishes no false tables, so the completion is the
# yardstick.  The ratio term (1.2x) forbids a raise-everything strategy
# where false rates are material; the absolute-slack term (+0.01, one
# event per hundred low candidates) keeps the criterion meaningful
# where the baseline rate itself is sub-1% and a pure ratio would
# amplify counting noise (e.g. rho=2.5%: 110 baseline events out of
# 14k lows).  At rho=1% the bound evaluates to completion+0.01 ~ 0.055
# — the round-4 VERDICT's own target for that point.
FALSE_RATIO = 1.2
FALSE_ABS = 0.01
false_match = {"bound": f"max({FALSE_RATIO}x, +{FALSE_ABS}) vs "
                        "completion",
               "baseline_method": "deepcomp", "per_method": {}}
base_false = np.asarray([e["false"] / (e["lows"] + 1)
                         for e in events["deepcomp"]])
bound = np.maximum(FALSE_RATIO * base_false, base_false + FALSE_ABS)
false_all_pass = True
for m in ("nasdac", "dowjons"):
    ours_false = np.asarray([e["false"] / (e["lows"] + 1)
                             for e in events[m]])
    ok = bool(np.all(ours_false <= bound + 1e-9))
    false_all_pass &= ok
    false_match["per_method"][m] = {
        "false_rates": [round(float(v), 4) for v in ours_false],
        "baseline_rates": [round(float(v), 4) for v in base_false],
        "bounds": [round(float(v), 4) for v in bound],
        "ratios": [round(float(a / max(b, 1e-12)), 3)
                   for a, b in zip(ours_false, base_false)],
        "pass": ok,
    }
    log(f"false guard {m:9s} rates "
        + " ".join(f"{v:.4f}" for v in ours_false)
        + "  bounds "
        + " ".join(f"{v:.4f}" for v in bound)
        + ("  PASS" if ok else "  FAIL"))
false_match["all_pass"] = false_all_pass

OUT = os.environ.get("QSC_MISSPROB_OUT", "/root/repo/MISSPROB.json")
with open(OUT, "w") as f:
    json.dump({
        "protocol": "joint_opt_ae.m:514-544 events, :549-554 denominators",
        "config": CONFIG,
        "rhos": list(RHOS),
        "num_examples": NUM_EXAMPLES,
        "published": PUBLISHED,
        "ours": curves,
        "events": events,
        "false_match": false_match,
        "wall_seconds": wall,
        "all_match_or_beat": all_pass,
        "notes": "DowJons uses the VAE prior (reference: SNGAN); "
                 "published rows are the reference's own Monte-Carlo "
                 "aggregates at unspecified example counts.",
    }, f, indent=1)
log(f"wrote {OUT}; all_match_or_beat =", all_pass)
