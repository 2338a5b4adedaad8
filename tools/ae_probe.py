"""Probe the committed completion AE: does output respond to mask /
input amplitude at all, and what amplitude regime does it expect?"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from quantized_spectrum_cartography_tpu.baselines.pretrained import AE_CKPT
from quantized_spectrum_cartography_tpu.config import PhysicsConfig
from quantized_spectrum_cartography_tpu.data.datasets import make_slf_sampler
from quantized_spectrum_cartography_tpu.models import Autoencoder
from quantized_spectrum_cartography_tpu.training import load_checkpoint

state = dict(load_checkpoint(AE_CKPT))
scale = float(state.pop("scale"))
model = Autoencoder(activation="selu")

slf = np.asarray(make_slf_sampler(PhysicsConfig())(
    jax.random.PRNGKey(0), 4))
print("slf stats: peak", slf.max(axis=(1, 2)), "mean", slf.mean())

def run(mask, amp):
    inp = jnp.stack([mask, jnp.asarray(slf[0]) * mask * amp], -1)[None]
    out = model.apply(state, inp, train=False)
    return np.asarray(out[0, :, :, 0])

ones = jnp.ones((51, 51))
half = (jax.random.uniform(jax.random.PRNGKey(1), (51, 51)) < 0.5
        ).astype(jnp.float32)
zeros = jnp.zeros((51, 51))

o1 = run(ones, scale)
o2 = run(half, scale)
o3 = run(zeros, scale)
print("||full-half||/||full||:", np.linalg.norm(o1 - o2) / np.linalg.norm(o1))
print("||full-zero||/||full||:", np.linalg.norm(o1 - o3) / np.linalg.norm(o1))
tgt = slf[0] * scale
print("target peak(scaled):", tgt.max(), " out peak:", o1.max(),
      " out/tgt at argmax:", o1.flat[np.argmax(tgt)] / tgt.max())
print("rel MSE full-obs (scaled):",
      float(np.mean((o1 - tgt) ** 2) / np.mean(tgt ** 2)))
for amp in (1.0, 10.0, 50.0, 100.0):
    o = run(ones, amp)
    t = slf[0] * amp
    print(f"amp {amp:6.1f}: out/tgt@peak {o.flat[np.argmax(t)]/t.max():.3f} "
          f"relMSE {float(np.mean((o-t)**2)/np.mean(t**2)):.3f}")
