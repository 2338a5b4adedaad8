"""Probe: does cosine LR decay + longer budget move the DIP floor?

One dither seed, 2 restarts, comparing (steps, schedule) cells on the
fixture protocol.  Decides whether the DIP_QUALITY protocol should
adopt the annealed run (ground-truth-free rules unchanged; this probe
reads NMSE only to pick the solver configuration, exactly like every
other hyperparameter choice in the framework).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

t0 = time.time()


def log(*a):
    print(f"[{time.time()-t0:6.1f}s]", *a, flush=True)


from quantized_spectrum_cartography_tpu.data import load_onebit_fixture
from quantized_spectrum_cartography_tpu.ops.lowrank import get_tensor
from quantized_spectrum_cartography_tpu.ops.metrics import nmse
from quantized_spectrum_cartography_tpu.ops.quantizer import dither_probit
from quantized_spectrum_cartography_tpu.solvers import recover_dip_tensor

MEAN, STD = 0.0005, 0.008
prob = load_onebit_fixture()
R = prob.S_true.shape[0]
key = jax.random.PRNGKey(0)
T_obs = dither_probit(key, prob.T_true - MEAN, STD)

CELLS = [
    (1000, "constant", 0.99),
    (1000, "constant", 0.995),
    (1500, "cosine", 0.99),
    (2000, "cosine", 0.995),
]
for steps, sched, ema in CELLS:
    for rs in range(2):
        S, C, losses, nm, aux = recover_dip_tensor(
            jax.random.fold_in(key, 7 + 13 * rs), T_obs, mean=MEAN,
            std=STD, num_emitters=R, steps=steps, T_true=prob.T_true,
            l2_c=0.03, lr_schedule=sched, out_ema_decay=ema)
        ret = float(nmse(get_tensor(S, C), prob.T_true))
        ret_ema = float(nmse(aux["T_ema"], prob.T_true))
        log(f"steps={steps:4d} {sched:8s} ema={ema} rs{rs}: "
            f"out-EMA {ret_ema:.4f}  stopped {ret:.4f} "
            f"traj_best {float(np.min(np.asarray(nm))):.4f} "
            f"traj_last {float(nm[-1]):.4f}")
