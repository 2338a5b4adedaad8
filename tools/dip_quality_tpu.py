"""DIP quality on the 1-bit fixture protocol — 5 seeds x 3 restarts.

The reference lost its DIP driver (`qmc/dip.py` empty, `qmc/dip.ipynb`
stripped); `solvers/recover_dip_tensor` rebuilds the path (R untrained
`DecoderDip` instances as spatial priors + free nonneg C).  This tool
validates it is *capable*: full-tensor 1-bit recovery on
`onebitdata1.mat` under the exact fixture-parity protocol (probit dither
MEAN=0.0005 STD=0.008 — tools/fixture_parity.py), reported against the
free-S low-rank solver's 0.79 protocol floor (RESULTS.md).

Protocol hardening (round 4):
- 5 dither seeds x 3 solver restarts;
- the reported NMSE is computed from the RETURNED factors (the
  best-validation early-stopped iterate), not from the trajectory's last
  entry — the two differ because early stopping restores an earlier
  iterate.

Round 5 (VERDICT task 3): restart selection switched from final
training fit — measured NON-discriminative (0.672±0.001 across all
restarts) — to the HELD-OUT-entry fit (`aux["holdout_best"]`, the
EMA-smoothed validation NLL at the returned iterate), and the stopping
rule itself now minimizes the smoothed validation curve rather than its
noisy pointwise values.  Both rules remain ground-truth-free.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

t0 = time.time()


def log(*a):
    print(f"[{time.time()-t0:6.1f}s]", *a, flush=True)


log("backend:", jax.default_backend())

from quantized_spectrum_cartography_tpu.data import load_onebit_fixture
from quantized_spectrum_cartography_tpu.ops.lowrank import get_tensor
from quantized_spectrum_cartography_tpu.ops.metrics import nmse
from quantized_spectrum_cartography_tpu.ops.quantizer import dither_probit
from quantized_spectrum_cartography_tpu.solvers import recover_dip_tensor

SEEDS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
RESTARTS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
MEAN, STD = 0.0005, 0.008
STEPS = 1000                       # matches the low-rank 50x(10+10) budget

prob = load_onebit_fixture()
R = prob.S_true.shape[0]

per_seed = []
for seed in range(SEEDS):
    key = jax.random.PRNGKey(seed)
    T_obs = dither_probit(key, prob.T_true - MEAN, STD)
    cands = []
    t_hats = []
    for rs in range(RESTARTS):
        # out_ema_decay=0.995: the 1-bit validation NLL is measured
        # nearly flat (0.687±0.001) so best-val stopping loses ~0.06
        # NMSE to late-trajectory oscillation; the output EMA tracks
        # traj_best to within ~0.01 with no stopping signal at all
        # (tools/dip_lr_probe.py)
        S, C, losses, nm, aux = recover_dip_tensor(
            jax.random.fold_in(key, 7 + 13 * rs), T_obs, mean=MEAN,
            std=STD, num_emitters=R, steps=STEPS, T_true=prob.T_true,
            l2_c=0.03, out_ema_decay=0.995,
            holdout_key=jax.random.fold_in(key, 999))
        T_hat = aux["T_ema"]
        t_hats.append(np.asarray(T_hat))
        returned = float(nmse(T_hat, prob.T_true))
        stopped = float(nmse(get_tensor(S, C), prob.T_true))
        fit = float(aux["final_fit"])
        # key naming: nmse_out_ema = the round-5 output-EMA estimator;
        # nmse_stopped_iterate = the round-4 smoothed-val stopped
        # iterate.  The ambiguous 'nmse_returned' key (which silently
        # changed meaning between rounds) is retired.
        cands.append({"restart": rs, "nmse_out_ema": returned,
                      "nmse_stopped_iterate": stopped,
                      "final_fit": fit,
                      "holdout_best": float(aux["holdout_best"]),
                      "traj_last": float(nm[-1]),
                      "traj_best": float(np.min(np.asarray(nm)))})
        log(f"seed {seed} restart {rs}: out-EMA NMSE {returned:.4f} "
            f"(stopped {stopped:.4f}, traj last "
            f"{cands[-1]['traj_last']:.4f} best "
            f"{cands[-1]['traj_best']:.4f}, holdout "
            f"{cands[-1]['holdout_best']:.4f})")
    pick = min(cands, key=lambda c: c["holdout_best"])
    pick_by_fit = min(cands, key=lambda c: c["final_fit"])
    # restart ENSEMBLE (ground-truth-free): average the restarts'
    # early-stopped reconstructions.  The restarts differ only in
    # decoder init, so their errors partially decorrelate and the mean
    # tensor's NMSE sits below the average member NMSE — a standard DIP
    # variance-reduction that needs no selection signal at all.
    T_ens = np.mean(np.stack(t_hats), axis=0)
    ens = float(nmse(jnp.asarray(T_ens), prob.T_true))
    per_seed.append({"seed": seed, "picked_restart": pick["restart"],
                     "nmse": ens,
                     "nmse_picked_single": pick["nmse_out_ema"],
                     "nmse_if_picked_by_final_fit":
                         pick_by_fit["nmse_out_ema"],
                     "nmse_restart_ensemble": ens,
                     "restarts": cands})
    log(f"seed {seed}: ensemble NMSE {ens:.4f}; holdout-picked single "
        f"{pick['nmse_out_ema']:.4f} (final-fit rule would give "
        f"{pick_by_fit['nmse_out_ema']:.4f})")

vals = np.asarray([s["nmse"] for s in per_seed])
out = {
    "protocol": "onebitdata1.mat, probit dither mean=0.0005 std=0.008, "
                f"{SEEDS} seeds x {RESTARTS} restarts, {STEPS} Adam "
                "steps; per restart the reconstruction is the OUTPUT "
                "EMA (decay 0.995) along the trajectory — adopted "
                "because the 1-bit validation NLL is measured flat "
                "(0.687±0.001) and cannot rank iterates, while the EMA "
                "tracks traj_best to ~0.01 with no stopping signal "
                "(tools/dip_lr_probe.py); per seed the reported NMSE "
                "is the restart ensemble (mean of the EMA "
                "reconstructions).  All rules ground-truth-free.",
    "config": {"steps": STEPS, "lr": 0.001, "z_dim": 256,
               "holdout_frac": 0.05, "l2_c": 0.03,
               "val_ema_decay": 0.9, "out_ema_decay": 0.995,
               "fixed_holdout_split_per_seed": True,
               "seeds": SEEDS, "restarts": RESTARTS},
    "per_seed": per_seed,
    "dip_nmse_per_seed": [round(float(v), 4) for v in vals],
    "dip_nmse_mean": round(float(vals.mean()), 4),
    "dip_nmse_median": round(float(np.median(vals)), 4),
    "dip_nmse_spread": [round(float(vals.min()), 4),
                        round(float(vals.max()), 4)],
    "lowrank_floor": 0.79,
    "reference_anchor": "deep_prior/networks/dip.py:20-89 (architecture); "
                        "qmc/dip.py (lost driver); protocol "
                        "backup/notebooks/onebit_lowrank.ipynb",
}
with open("/root/repo/DIP_QUALITY.json", "w") as f:
    json.dump(out, f, indent=1)
log("wrote DIP_QUALITY.json: mean", out["dip_nmse_mean"], "median",
    out["dip_nmse_median"], "spread", out["dip_nmse_spread"])
