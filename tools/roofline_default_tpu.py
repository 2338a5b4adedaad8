"""Roofline of the DEFAULT solver kernel: specialized 1-bit Pallas NLL,
forward AND backward, with the binding-resource arithmetic.

BASELINE.md's north star says "dequant+matmul kernels at speed-of-light";
round 2 rooflined only the generic (W,U) forward (62% HBM).  The default
path (`solvers/lowrank_mle.py` -> `fused_onebit_nll`) reads int8 codes —
~0.2 MB/map — so at measured speeds it CANNOT be HBM-bound; the wall is
the VPU transcendental pipeline (_log_ndtr: 1 exp + 3 log per element
forward, _hazard_ratio: 2 exp backward — both where-branches always
execute on a vector machine).  This tool measures:

1. fwd and fwd+bwd time at the bench shape (B=128, chain-serialized,
   ONE host fence — block_until_ready lies through the axon tunnel);
2. an EMPIRICAL transcendental ceiling: a pure exp-chain XLA program over
   the same element count (the achievable exp/s on this chip+compiler);
3. achieved bytes/s vs HBM peak and transcendental-evals/s vs the
   measured exp ceiling -> which resource binds, and at what fraction.

Writes ROOFLINE_1BIT.json.
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

from quantized_spectrum_cartography_tpu.ops.lowrank import pad_spatial
from quantized_spectrum_cartography_tpu.ops.pallas import (
    fused_onebit_nll, pack_codes_1bit)
from quantized_spectrum_cartography_tpu.utils.profiling import V5E_HBM_GBPS

K, I, J, R = 64, 51, 51, 2
MEAN, STD = 0.0045, 0.008
Bn, CHAIN = 128, 10
rng = np.random.default_rng(0)

S = pad_spatial(jnp.asarray(
    rng.uniform(0.0, 0.05, (R, I * J)).astype(np.float32)))
C = jnp.asarray(rng.uniform(0.0, 1.0, (K, R)).astype(np.float32))
IJp = S.shape[1]
Y1 = jnp.asarray(rng.integers(0, 2, (K, I, J)).astype(np.float32))
maskv = jnp.asarray(rng.integers(0, 2, (K, I, J)).astype(np.float32))
Yc = pack_codes_1bit(Y1, maskv)

Sb = jnp.broadcast_to(S, (Bn,) + S.shape)
Cb = jnp.broadcast_to(C, (Bn,) + C.shape)
Ycb = jnp.broadcast_to(Yc, (Bn,) + Yc.shape)

elems = Bn * K * IJp                      # likelihood entries per pass
# traffic per pass (fwd): int8 codes + f32 S + f32 C per map
fwd_bytes = Bn * (K * IJp * 1 + 4 * (R * IJp + K * R))
# bwd adds dS, dC writes and re-reads codes/S/C
bwd_extra_bytes = Bn * (K * IJp * 1 + 4 * (2 * R * IJp + 2 * K * R))
# transcendental evals per element (both select branches execute):
# fwd _log_ndtr = 1 exp + 3 log;  bwd _hazard_ratio = 2 exp
FWD_TRANS = 4
BWD_TRANS = 2

vfwd = jax.vmap(lambda s, c, y: fused_onebit_nll(
    s, c, y, MEAN, STD, False, "pallas"))


def timed_chain(fn, x0, label):
    f = jax.jit(fn)
    t1 = time.time()
    v = float(f(x0))
    log(f"{label} compiled in {time.time()-t1:.0f}s (value {v:.4e})")
    best = np.inf
    for _ in range(3):
        t1 = time.time()
        float(f(x0))
        best = min(best, (time.time() - t1) / CHAIN)
    return best


def fwd_chain(s0):
    def link(s, _):
        nll = vfwd(s, Cb, Ycb)
        return s + 1e-20 * nll[:, None, None], jnp.sum(nll)
    s, nlls = jax.lax.scan(link, s0, None, length=CHAIN)
    return jnp.sum(nlls) + jnp.sum(s[0, 0, :1])


def fwdbwd_chain(s0):
    def link(s, _):
        def per_map(sm, cm, ym):
            return fused_onebit_nll(sm, cm, ym, MEAN, STD, False, "pallas")
        nll, (gS, gC) = jax.vmap(
            jax.value_and_grad(per_map, argnums=(0, 1)))(s, Cb, Ycb)
        return s + 1e-9 * gS, jnp.sum(nll)
    s, nlls = jax.lax.scan(link, s0, None, length=CHAIN)
    return jnp.sum(nlls) + jnp.sum(s[0, 0, :1])


def exp_chain(x0):
    """Empirical transcendental ceiling: M exps per element per link,
    data-dependent so nothing folds."""
    M = 8

    def link(x, _):
        for _ in range(M):
            x = jnp.exp(-x)
        return x, jnp.sum(x[0, 0, :1])
    x, _ = jax.lax.scan(link, x0, None, length=CHAIN)
    return jnp.sum(x[0, 0, :1])


out = {"shape": {"B": Bn, "K": K, "IJp": int(IJp), "R": R},
       "elems_per_pass": int(elems)}

dt_f = timed_chain(fwd_chain, Sb, "fwd chain")
out["fwd_ms"] = round(dt_f * 1e3, 3)
out["fwd_GBps"] = round(fwd_bytes / dt_f / 1e9, 1)
out["fwd_pct_hbm"] = round(100 * out["fwd_GBps"] / V5E_HBM_GBPS, 1)
out["fwd_trans_per_s"] = FWD_TRANS * elems / dt_f

dt_fb = timed_chain(fwdbwd_chain, Sb, "fwd+bwd chain")
out["fwdbwd_ms"] = round(dt_fb * 1e3, 3)
total_bytes = fwd_bytes + bwd_extra_bytes
out["fwdbwd_GBps"] = round(total_bytes / dt_fb / 1e9, 1)
out["fwdbwd_pct_hbm"] = round(100 * out["fwdbwd_GBps"] / V5E_HBM_GBPS, 1)
out["fwdbwd_trans_per_s"] = (FWD_TRANS + BWD_TRANS) * elems / dt_fb

x0 = jnp.broadcast_to(
    jnp.abs(jnp.asarray(rng.uniform(0.1, 1.0, (K, IJp)).astype(
        np.float32))), (Bn, K, IJp))
dt_e = timed_chain(exp_chain, x0, "exp-ceiling chain")
M = 8
exp_per_s = M * elems / dt_e
out["exp_ceiling_per_s"] = exp_per_s
out["exp_ceiling_ms_per_pass"] = round(dt_e * 1e3 / M, 3)

out["fwd_pct_exp_ceiling"] = round(
    100 * out["fwd_trans_per_s"] / exp_per_s, 1)
out["fwdbwd_pct_exp_ceiling"] = round(
    100 * out["fwdbwd_trans_per_s"] / exp_per_s, 1)
out["binding_resource"] = (
    "VPU transcendental pipeline" if out["fwd_pct_exp_ceiling"] >
    out["fwd_pct_hbm"] else "HBM bandwidth")
out["arithmetic"] = (
    f"fwd: {FWD_TRANS} transcendentals/elem (log_ndtr: 1 exp + 3 log, "
    f"both branches execute) x {elems} elems = "
    f"{FWD_TRANS*elems/1e9:.2f}G evals/pass; HBM traffic only "
    f"{fwd_bytes/1e6:.0f} MB/pass -> at HBM speed-of-light the pass "
    f"would take {fwd_bytes/V5E_HBM_GBPS/1e6:.3f} ms; measured "
    f"{out['fwd_ms']} ms >> that, so HBM cannot be the wall")

log(json.dumps(out, indent=1, default=float))
with open("/root/repo/ROOFLINE_1BIT.json", "w") as f:
    json.dump(out, f, indent=1, default=float)
log("wrote ROOFLINE_1BIT.json")
