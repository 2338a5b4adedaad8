"""DIP quality datapoint on the 1-bit fixture protocol.

The reference lost its DIP driver (`qmc/dip.py` empty, `qmc/dip.ipynb`
stripped); `solvers/recover_dip_tensor` rebuilds the path (R untrained
`DecoderDip` instances as spatial priors + free nonneg C).  This tool
validates it is *capable*, not just present: full-tensor 1-bit recovery
on `onebitdata1.mat` under the exact fixture-parity protocol
(probit dither MEAN=0.0005 STD=0.008, 3 dither seeds — tools/
fixture_parity.py), reported against the free-S low-rank solver's 0.79
protocol floor (RESULTS.md).
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

from quantized_spectrum_cartography_tpu.data import load_onebit_fixture
from quantized_spectrum_cartography_tpu.ops.quantizer import dither_probit
from quantized_spectrum_cartography_tpu.solvers import recover_dip_tensor

SEEDS = 3
MEAN, STD = 0.0005, 0.008
STEPS = 1000                       # matches the low-rank 50x(10+10) budget

prob = load_onebit_fixture()
R = prob.S_true.shape[0]

nmses = []
for seed in range(SEEDS):
    key = jax.random.PRNGKey(seed)
    T_obs = dither_probit(key, prob.T_true - MEAN, STD)
    S, C, losses, nm = recover_dip_tensor(
        jax.random.fold_in(key, 7), T_obs, mean=MEAN, std=STD,
        num_emitters=R, steps=STEPS, T_true=prob.T_true, l2_c=0.03)
    final = float(nm[-1])
    best = float(np.min(np.asarray(nm)))
    nmses.append(final)
    log(f"seed {seed}: final NMSE {final:.4f} (best-iter {best:.4f}, "
        f"loss {float(losses[0]):.1f} -> {float(losses[-1]):.1f})")

mean_nmse = float(np.mean(nmses))
out = {
    "protocol": "onebitdata1.mat, probit dither mean=0.0005 std=0.008, "
                f"{SEEDS} seeds, {STEPS} Adam steps (fixture_parity.py "
                "protocol)",
    "dip_nmse_per_seed": [round(v, 4) for v in nmses],
    "dip_nmse_mean": round(mean_nmse, 4),
    "lowrank_floor": 0.79,
    "reference_anchor": "deep_prior/networks/dip.py:20-89 (architecture); "
                        "qmc/dip.py (lost driver)",
}
with open("/root/repo/DIP_QUALITY.json", "w") as f:
    json.dump(out, f, indent=1)
log("wrote DIP_QUALITY.json:", json.dumps(out))
