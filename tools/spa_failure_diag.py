"""Is the low-rho catastrophic miss mode SPA-fundamental or
sampling-induced?

Runs SPA factorization on (a) the fully observed tensor, (b) the rho=1%
masked tensor, for the same 50 draws, and counts per-example lost-peak
events from the rank-R reconstruction alone (no AE, no alternation).
Also reports, for the masked case, whether the catastrophic examples are
the ones with no sample near the second emitter's peak.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

t0 = time.time()


def log(*a):
    print(f"[{time.time()-t0:6.1f}s]", *a, flush=True)


from quantized_spectrum_cartography_tpu.baselines import (
    BatchedHarness, condition_grid, load_pretrained_methods)
from quantized_spectrum_cartography_tpu.baselines.spa import nmf_spa
from quantized_spectrum_cartography_tpu.baselines.nnls import nnls_rows
from quantized_spectrum_cartography_tpu.config import PhysicsConfig
from quantized_spectrum_cartography_tpu.ops.lowrank import get_tensor
from quantized_spectrum_cartography_tpu.ops.metrics import detection_counts
from quantized_spectrum_cartography_tpu.physics.shadowing import (
    correlation_cholesky)

NUM = 50
RHO = 0.01

methods = load_pretrained_methods(only=("deepcomp",))
h = BatchedHarness(methods, PhysicsConfig(), log_fn=log)
cond = condition_grid("fraction", (RHO,))[0]
I = h.physics.grid_size
num = int(round(cond.fraction * I * I))
genf = h._problem_gen(cond.num_emitters)
chol = jnp.asarray(correlation_cholesky(I, float(cond.xc)))
keys = jax.random.split(jax.random.PRNGKey(0), NUM)
arrs = dict(genf(keys, chol, jnp.float32(cond.shadow_sigma),
                 jnp.float32(0.0), jnp.int32(num)))

T_noisy = np.asarray(arrs["T_noisy"])
peaks = np.asarray(arrs["peaks"])
Om = np.asarray(arrs["Om"])
R = 2


def spa_recon(T, W):
    """SPA + NNLS rank-R fit of masked tensor; returns T_hat."""
    K = T.shape[0]
    Tm = (T * W[None]).reshape(K, -1)
    _, S_flat = nmf_spa(Tm, R)
    Wf = W.reshape(1, -1)
    design = (S_flat * Wf).T
    C = nnls_rows(design, Tm, iters=200).T
    return get_tensor(S_flat.reshape(R, I, I), C)


f_full = jax.jit(jax.vmap(lambda T: spa_recon(T, jnp.ones((I, I)))))
f_mask = jax.jit(jax.vmap(spa_recon))

Wm = jnp.asarray(Om, jnp.float32)
Th_full = np.asarray(f_full(jnp.asarray(T_noisy)))
Th_mask = np.asarray(f_mask(jnp.asarray(T_noisy), Wm))

for name, Th in [("spa_full_observation", Th_full),
                 ("spa_rho1pct", Th_mask)]:
    miss = tot = 0
    cat = []
    for b in range(NUM):
        m, p, _, _ = detection_counts(jnp.asarray(Th[b]),
                                      jnp.asarray(T_noisy[b]),
                                      jnp.asarray(peaks[b]))
        miss += int(m); tot += int(p)
        cat.append(int(m) / max(int(p), 1))
    cat = np.asarray(cat)
    log(f"{name:22s} miss {miss}/{tot} = {miss/(tot+1):.4f} "
        f"catastrophic(>50%): {(cat > 0.5).sum()}/{NUM} zero: "
        f"{(cat == 0).sum()}/{NUM}")

# distance from each emitter peak to the nearest observed sample
d_near = np.zeros((NUM, R))
for b in range(NUM):
    obs = np.argwhere(Om[b])                        # [N, 2] (row=y, col=x)
    for r in range(R):
        x, y = peaks[b, r]
        d = np.sqrt((obs[:, 0] - y) ** 2 + (obs[:, 1] - x) ** 2)
        d_near[b, r] = d.min()

# per-example miss rate of masked SPA vs distance-to-nearest-sample
rates = []
for b in range(NUM):
    m, p, _, _ = detection_counts(jnp.asarray(Th_mask[b]),
                                  jnp.asarray(T_noisy[b]),
                                  jnp.asarray(peaks[b]))
    rates.append(int(m) / max(int(p), 1))
rates = np.asarray(rates)
dmax = d_near.max(axis=1)
log("corr(example miss rate, max over emitters of "
    f"dist-to-nearest-sample): {np.corrcoef(rates, dmax)[0,1]:.3f}")
for thr in (3, 5, 8):
    sel = dmax > thr
    log(f"  examples with an emitter >{thr}px from any sample: "
        f"{sel.sum()}/{NUM}, their mean miss rate {rates[sel].mean() if sel.any() else float('nan'):.3f} "
        f"vs others {rates[~sel].mean():.3f}")
