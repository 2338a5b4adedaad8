"""A/B the peak-gated observed-entry C polish at low rho (round-5 task 1).

The round-4 frontier: the anchored stack holds miss parity at rho=1%
(0.221 vs published 0.2688) but at completion-class SRE (~2.2 vs ~0.9
unanchored), and its false rate (0.080) runs 1.7x the completion
baseline (0.046).  The unconstrained polish recovers SRE but trades
miss 0.30 -> 0.44.  This tool measures the PEAK-GATED polish
(solvers/completion.peak_gated_blend): per-band blend to the
observed-fit C with a closed-form guarantee that witnessed peaks keep
>= gamma of their anchored value.

Sweeps (ridge_rel, gamma) against the ridge=0 baseline at rho in
{1, 2.5}% (the anchor-active region), NUM examples each, reporting
miss_prob / false_prob / SRE for nasdac + dowjons + deepcomp (the
false-rate yardstick).

Usage: python tools/gated_polish_diag.py [num_examples]
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

NUM = int(sys.argv[1]) if len(sys.argv) > 1 else 50
RHOS = (0.01, 0.025)
VARIANTS = [
    ("baseline_ridge0", dict(polish_ridge=0.0)),
    ("gated_r0.1_g0.8", dict(polish_ridge=0.1, polish_gamma=0.8)),
    ("gated_r0.1_g0.6", dict(polish_ridge=0.1, polish_gamma=0.6)),
    ("gated_r0.3_g0.8", dict(polish_ridge=0.3, polish_gamma=0.8)),
]
_KNOWN_MODES = ("refine", "conftau", "qp", "floor")
if len(sys.argv) > 2 and sys.argv[2] not in _KNOWN_MODES:
    # a typo'd mode would silently run the round-1 default sweep AND
    # clobber the committed GATED_POLISH_DIAG.json artifact
    raise SystemExit(f"unknown sweep mode {sys.argv[2]!r}; "
                     f"expected one of {_KNOWN_MODES}")
if len(sys.argv) > 2 and sys.argv[2] == "refine":
    # round-2 refinement around the measured frontier: ridge 0.1 won;
    # gamma 0.8 held miss with margin, 0.6 cut false below the
    # completion baseline but ate the miss margin; sweep the midpoints
    # and the witness-coverage axis (protect R+4 peaks: misses the gate
    # gives back may be true peaks the 4-peak witness list skipped)
    VARIANTS = [
        ("gated_r0.1_g0.7_p2", dict(polish_ridge=0.1, polish_gamma=0.7)),
        ("gated_r0.1_g0.85_p2", dict(polish_ridge=0.1,
                                     polish_gamma=0.85)),
        ("gated_r0.1_g0.8_p4", dict(polish_ridge=0.1, polish_gamma=0.8,
                                    polish_peaks_extra=4)),
        ("gated_r0.1_g0.7_p4", dict(polish_ridge=0.1, polish_gamma=0.7,
                                    polish_peaks_extra=4)),
    ]
if len(sys.argv) > 2 and sys.argv[2] == "conftau":
    # round-5 headroom probe: confidence-weighted anchor (per-entry
    # anchor weight decays exp(-(D-1)/tau) with distance D to the
    # nearest observed sample) at the adopted gamma=0.75 gate.  The
    # oracle-C floor (LOWRHO_SRE_FLOOR.json: 0.43-0.47 at rho=1%) says
    # amplitude assignment still carries 2x headroom; the flat anchor
    # imprints completion error hardest where completion is least
    # trustworthy.
    VARIANTS = [
        ("tau_off_g0.75", dict(polish_ridge=0.1, polish_gamma=0.75)),
        ("tau8_g0.75", dict(polish_ridge=0.1, polish_gamma=0.75,
                            anchor_conf_tau=8.0)),
        ("tau16_g0.75", dict(polish_ridge=0.1, polish_gamma=0.75,
                             anchor_conf_tau=16.0)),
        ("tau4_g0.75", dict(polish_ridge=0.1, polish_gamma=0.75,
                            anchor_conf_tau=4.0)),
    ]
if len(sys.argv) > 2 and sys.argv[2] == "qp":
    # round-5 continuation: per-band inequality-CONSTRAINED ridge NNLS
    # (solvers/completion._constrained_polish_c) vs the adopted
    # line-segment blend at the same gamma.  The blend point is feasible
    # for the QP, so at equal peak protection the QP is weakly better on
    # the total (observed + ridge) objective; the question is how much of the
    # 2.1x oracle-floor SRE headroom (LOWRHO_SRE_FLOOR.json) that buys
    # and what it does to miss/false.
    VARIANTS = [
        ("blend_g0.75", dict(polish_ridge=0.1, polish_gamma=0.75)),
        ("qp_g0.75", dict(polish_ridge=0.1, polish_gamma=0.75,
                          polish_mode="qp")),
        ("qp_g0.85", dict(polish_ridge=0.1, polish_gamma=0.85,
                          polish_mode="qp")),
        ("qp_g0.9", dict(polish_ridge=0.1, polish_gamma=0.9,
                         polish_mode="qp")),
    ]
if len(sys.argv) > 2 and sys.argv[2] == "floor":
    # round-3 refinement: the protection floor (peak_gated_blend
    # protect_floor — drop protection of (band, peak) pairs whose
    # anchored render is near the 0.01 event threshold; they save ~no
    # misses but each kept render > 0.01 at an inactive band IS a false
    # event).  Earlier sweeps ran floor=0 semantics.
    VARIANTS = [
        ("g0.8_floor0.02", dict(polish_ridge=0.1, polish_gamma=0.8,
                                polish_floor=0.02)),
        ("g0.85_floor0.02", dict(polish_ridge=0.1, polish_gamma=0.85,
                                 polish_floor=0.02)),
        ("g0.8_floor0.04", dict(polish_ridge=0.1, polish_gamma=0.8,
                                polish_floor=0.04)),
        ("g0.9_floor0.03", dict(polish_ridge=0.1, polish_gamma=0.9,
                                polish_floor=0.03)),
    ]

conds = condition_grid("fraction", RHOS)
results = {}
for vname, kw in VARIANTS:
    methods = load_pretrained_methods(
        only=("deepcomp", "nasdac", "dowjons"), **kw)
    h = BatchedHarness(methods, PhysicsConfig(), log_fn=None)
    out = h.run(conds, num_examples=NUM, seed=0)
    results[vname] = {}
    for cond in conds:
        lab = cond.label()
        results[vname][lab] = {}
        for m in methods:
            st = out[lab][m]
            results[vname][lab][m] = {
                "sre": round(st["sre"], 4),
                "miss_prob": round(st["miss_prob"], 4),
                "false_prob": round(st["false_prob"], 4),
                "miss_count": st["miss_count"],
                "false_count": st["false_count"],
            }
            log(f"{vname:18s} {lab[:22]:22s} {m:9s} "
                f"sre {st['sre']:7.4f}  miss {st['miss_prob']:.4f}  "
                f"false {st['false_prob']:.4f}")

_suffix = {"refine": "2", "floor": "3", "conftau": "4", "qp": "5"}.get(
    sys.argv[2] if len(sys.argv) > 2 else "", "")
OUT = f"/root/repo/GATED_POLISH_DIAG{_suffix}.json"
with open(OUT, "w") as f:
    json.dump({"num_examples": NUM, "rhos": list(RHOS),
               "results": results,
               "wall_seconds": round(time.time() - t0, 1)}, f, indent=1)
log("wrote", OUT)
