"""Retrain the completion AE with the corrected target scale.

The round-2 checkpoint was trained at scale=50 against the sigmoid
decoder head — targets (peak ~13) were unrepresentable, the model
saturated, and peak amplitudes came out at 0.08x truth (the direct cause
of the round-2 miss-detection plateau; tools/ae_probe.py).  This retrains
at scale=2.5 (SLF peak ~0.26 -> target peak ~0.65, inside the sigmoid
range) in 'mixed' data mode — the checkpoint serves BOTH consumers:
Nasdac completes single SLFs, DeepComp completes single bands (mixtures).

Usage: python tools/train_ae_tpu.py [steps]
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

from quantized_spectrum_cartography_tpu.config import PhysicsConfig
from quantized_spectrum_cartography_tpu.training.ae_trainer import (
    AETrainConfig, train_ae)

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 30000
CKPT = "/root/repo/checkpoints/ae_completion"

cfg = AETrainConfig(steps=STEPS, data_mode="mixed", scale=2.5,
                    batch_size=64)
log(f"training AE: {cfg}")
variables, info = train_ae(jax.random.PRNGKey(0), cfg,
                           PhysicsConfig(), checkpoint_dir=CKPT,
                           log_fn=log)
log("saved to", CKPT)
with open("/root/repo/AE_RETRAIN.json", "w") as f:
    json.dump({"steps": STEPS, "scale": cfg.scale,
               "data_mode": cfg.data_mode,
               "final_mse": info["metrics"][-1][1],
               "loss_history_tail": info["metrics"][-5:],
               "wall_seconds": time.time() - t0}, f, indent=1)
