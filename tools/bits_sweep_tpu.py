"""1-to-8-bit end-to-end recovery sweep + 256-bin (W,U)-kernel throughput.

SURVEY §0's problem statement is "1-bit up to 8-bit"; round 2 measured
only up to 4-bit log-domain.  This tool runs batched free-factor ordinal
MLE recovery (the multi-bit analogue of the 1-bit low-rank solver) at
1/2/3/4 bits (log-domain tables, `qmc/utils.py:30-52`) and 8 bits
(256-bin uniform LINEAR table, `qmc/utils.py:17-27` uniform boundaries),
plus the unquantized masked-LS floor — one fixed problem set (64 maps,
f=0.1 per-entry sampling), reporting NMSE and NMSE_LOG per bit depth.

Compile economy: (W,U) bounds are gathered outside the solver, so their
shapes are bin-count independent — ONE compiled program serves every
log-domain depth (sigma/offset enter traced); the linear-domain 8-bit
program and the Euclidean floor are two more.  Last, the generic
(W,U) Pallas kernel is timed at the 256-bin operating point (B=128
chain-serialized, single host fence) — the multi-bit throughput
datapoint.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import optax

t0 = time.time()


def log(*a):
    print(f"[{time.time()-t0:6.1f}s]", *a, flush=True)


log("backend:", jax.default_backend())

from quantized_spectrum_cartography_tpu.config import PhysicsConfig
from quantized_spectrum_cartography_tpu.ops import boundaries as B
from quantized_spectrum_cartography_tpu.ops.likelihood import (
    gather_bin_bounds, log_prob_probit_bounds, masked_nll)
from quantized_spectrum_cartography_tpu.ops.lowrank import (
    get_tensor, pad_spatial, project_nonneg, project_rank, safe_fro)
from quantized_spectrum_cartography_tpu.ops.metrics import nmse, nmse_log
from quantized_spectrum_cartography_tpu.ops.quantizer import (
    quantize, quantize_log)
from quantized_spectrum_cartography_tpu.physics import generate_map_batch
from quantized_spectrum_cartography_tpu.solvers import recalibrate_gain

BATCH, R, ITERS, LR = 64, 2, 2000, 0.02
# Round-5 fix for the high-bit-depth anomaly (8-bit scored WORSE than
# 1-bit, 0.218 vs 0.169 NMSE_LOG): within a bin the ordinal likelihood
# is nearly flat, so at fine tables the NLL phase lets the factors
# wander away from the warm midpoint fit invisibly to the NLL.  A small
# midpoint TETHER term (masked LS to the dequantized midpoints, weight
# relative to the warm loss scale) fills the within-bin curvature; it is
# ~exact at high depth and negligible against the NLL's cross-bin
# gradients at 1-2 bits.  QSC_BITS_TETHER=0 restores the old objective.
TETHER = float(os.environ.get("QSC_BITS_TETHER", "0.1"))
# Optional sigma annealing (xN -> x1 geometric over the NLL phase) for
# the spiky small-sigma gradients; measured effect recorded in the JSON.
ANNEAL = float(os.environ.get("QSC_BITS_ANNEAL", "1.0"))
# cosine-decayed Adam + light S/C Frobenius regularization: the ordinal
# likelihood saturates in its outer bins, so unobserved-entry overshoot
# is only pulled back by rank + regularization — at 300 flat-LR steps the
# first sweep overshot to NMSE ~9 while NMSE_LOG sat at 0.67
SCHED = None  # built per-solver below (optax.cosine_decay_schedule)
FRACTION = 0.1
# Metric offset: NOT the 4-bin table's 1e-10 — with that offset the
# log-domain metric's dynamic range runs to log(1e-10) = -23 and the
# score is dominated by how each table's bottom bin constrains the
# near-zero tail (~uninformative at every depth), not by map fidelity.
# The 7-adjusted table's 2.27e-5 sits at the data's meaningful floor.
METRIC_OFFSET = B.LOG_OFFSET_7_ADJUSTED

# 4-bit dither override (probe knob).  Hypothesis tested round 5: at
# sigma=0.5 the dither blurs across several of the 16-adjusted table's
# fine bins, which would explain 4-bit scoring worse than 3-bit (0.079
# vs 0.050 NMSE_LOG).  REFUTED by measurement: sigma 0.5/0.25/0.1 gave
# NMSE_LOG 0.0787/0.0786/0.0800 — insensitive.  The residual 3-vs-4-bit
# gap sits in the 16-adjusted table's deeper log stretch (offset 2.4e-7
# vs the metric's 2.27e-5: tail gradients ~100x, clipped, diluting the
# informative mid-range terms — see the opt chain comment below).
SIGMA4 = float(os.environ.get("QSC_BITS_SIGMA4", "0.5"))

CONFIGS = [
    # (label, bits, boundaries, offset(None=linear), sigma)
    ("1-bit",  1, (B.QUANTIZATION_BOUNDARIES_4_BINS_LOG[0],
                   B.QUANTIZATION_BOUNDARIES_4_BINS_LOG[2],
                   B.QUANTIZATION_BOUNDARIES_4_BINS_LOG[-1]),
     B.LOG_OFFSET_4, 1.287),
    ("2-bit",  2, B.QUANTIZATION_BOUNDARIES_4_BINS_LOG, B.LOG_OFFSET_4,
     1.287),
    ("3-bit",  3, B.QUANTIZATION_BOUNDARIES_7_ADJUSTED,
     B.LOG_OFFSET_7_ADJUSTED, 0.5),
    ("4-bit",  4, B.QUANTIZATION_BOUNDARIES_16_ADJUSTED,
     B.LOG_OFFSET_16_ADJUSTED, SIGMA4),
    ("8-bit",  8, B.QUANTIZATION_BOUNDARIES_256_BINS_UNIFORM, None,
     B.SD_256_BINS_UNIFORM),
]
_only = os.environ.get("QSC_BITS_ONLY")
if _only:
    CONFIGS = [c for c in CONFIGS if c[0] in _only.split(",")]

T, S_true, C_true, _ = generate_map_batch(
    jax.random.PRNGKey(0), PhysicsConfig(), BATCH)
T = jnp.maximum(T, 0.0)
mask = jax.random.bernoulli(
    jax.random.PRNGKey(3), FRACTION, T.shape).astype(jnp.float32)
log(f"generated {BATCH} maps")


def solver_body(Wb, Ub, mask, T_true, Td, sigma, offset, linear):
    """Batched ordinal MLE on pre-gathered (W, U) bounds.  `linear` is a
    Python bool (two programs); sigma/offset are traced scalars.

    Warm start: WARM Adam steps of masked LS against the bin-midpoint
    dequantization Td (qmc/quantization_model_log.py:43-51 semantics) —
    a depth-independent convex-ish surrogate that lands the factors near
    the right basin before the saturating ordinal NLL takes over (cold
    NLL starts at 4+ bits converge to spurious flat-likelihood optima;
    first-sweep NMSE_LOG 0.37 at 4-bit vs 0.20 at 3-bit)."""
    Bn, K, I, J = Wb.shape
    WARM = 400
    # log-link gradients scale as 1/(T+offset): the 16-bin table's
    # offset (2.4e-7) makes bottom-bin tail gradients ~100x the 7-bin
    # table's, and they swamp Adam's shared S/C coordinates — clip the
    # global norm so the informative mid-range terms keep steering
    opt = optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.adam(optax.cosine_decay_schedule(LR, ITERS, alpha=0.05)))

    def one_loss(S, C, Wb, Ub, m, Td1, sig_t):
        Th = jnp.maximum(get_tensor(S, C), 0.0)
        x = Th if linear else jnp.log(Th + offset)
        nll = masked_nll(log_prob_probit_bounds(Wb, Ub, x, sig_t), m)
        tether = (TETHER * 1e4 * jnp.sum(m * jnp.square(Th - Td1))
                  if TETHER > 0.0 else 0.0)
        return (nll + tether
                + 0.01 * safe_fro(C) + 0.01 * safe_fro(S))

    def loss(params, sig_t):
        S, C = params
        return jnp.sum(jax.vmap(
            lambda s, c, w, u, m, td: one_loss(s, c, w, u, m, td, sig_t)
        )(S, C, Wb, Ub, mask, Td))

    S0 = 0.01 * jnp.abs(jax.random.normal(jax.random.PRNGKey(1),
                                          (Bn, R, I, J)))
    C0 = 0.01 * jnp.ones((Bn, R, K))

    def warm_loss(params):
        S, C = params
        Th = jax.vmap(get_tensor)(S, C)
        return jnp.sum(mask * jnp.square(Th - Td)) * 1e4

    wopt = optax.adam(0.02)

    def wstep(carry, i):
        params, state = carry
        l, g = jax.value_and_grad(warm_loss)(params)
        up, state = wopt.update(g, state, params)
        S, C = optax.apply_updates(params, up)
        S, C = jax.lax.cond(
            (i + 1) % 25 == 0,
            lambda sc: (project_nonneg(project_rank(sc[0], 10)),
                        project_nonneg(sc[1])),
            lambda sc: sc, (S, C))
        return ((S, C), state), l

    (params, _), _ = jax.lax.scan(
        wstep, ((S0, C0), wopt.init((S0, C0))), jnp.arange(WARM))

    def step(carry, i):
        params, state = carry
        # geometric sigma anneal ANNEAL*sigma -> sigma (ANNEAL=1: none)
        sig_t = sigma * jnp.power(ANNEAL, 1.0 - i / ITERS)
        l, g = jax.value_and_grad(loss)(params, sig_t)
        up, state = opt.update(g, state, params)
        S, C = optax.apply_updates(params, up)
        S, C = jax.lax.cond(
            (i + 1) % 25 == 0,
            lambda sc: (project_nonneg(project_rank(sc[0], 10)),
                        project_nonneg(sc[1])),
            lambda sc: sc, (S, C))
        return ((S, C), state), l

    (params, _), _ = jax.lax.scan(
        step, (params, opt.init(params)), jnp.arange(ITERS))
    S, C = params
    T_hat = jnp.maximum(jax.vmap(get_tensor)(S, C), 0.0)
    return T_hat


solve_log = jax.jit(lambda Wb, Ub, m, Tt, Td, sig, off: solver_body(
    Wb, Ub, m, Tt, Td, sig, off, False))
solve_lin = jax.jit(lambda Wb, Ub, m, Tt, Td, sig: solver_body(
    Wb, Ub, m, Tt, Td, sig, 0.0, True))


@jax.jit
def solve_floor(mask, T_true):
    """Unquantized masked-LS low-rank fit — the floor the bit ladder
    approaches (identical optimizer/projection budget)."""
    Bn, K, I, J = T_true.shape
    opt = optax.adam(optax.cosine_decay_schedule(LR, ITERS, alpha=0.05))

    def loss(params):
        S, C = params
        Th = jax.vmap(get_tensor)(S, C)
        return jnp.sum(mask * jnp.square(Th - T_true)) * 1e4

    S0 = 0.01 * jnp.abs(jax.random.normal(jax.random.PRNGKey(1),
                                          (Bn, R, I, J)))
    C0 = 0.01 * jnp.ones((Bn, R, K))

    def step(carry, i):
        params, state = carry
        l, g = jax.value_and_grad(loss)(params)
        up, state = opt.update(g, state, params)
        S, C = optax.apply_updates(params, up)
        S, C = jax.lax.cond(
            (i + 1) % 25 == 0,
            lambda sc: (project_nonneg(project_rank(sc[0], 10)),
                        project_nonneg(sc[1])),
            lambda sc: sc, (S, C))
        return ((S, C), state), l

    (params, _), _ = jax.lax.scan(
        step, ((S0, C0), opt.init((S0, C0))), jnp.arange(ITERS))
    S, C = params
    T_hat = jnp.maximum(jax.vmap(get_tensor)(S, C), 0.0)
    return (jax.vmap(nmse)(T_hat, T_true),
            jax.vmap(lambda a, b: nmse_log(a, b, METRIC_OFFSET))(
                T_hat, T_true))


results = {}
for label, bits, bb_t, offset, sigma in CONFIGS:
    bb = jnp.asarray(np.array(bb_t), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(2), BATCH)
    if offset is None:
        Y = jax.vmap(lambda t, k: quantize(k, t, sigma, bb))(T, keys)
    else:
        Y = jax.vmap(lambda t, k: quantize_log(k, t, sigma, bb, offset))(
            T, keys)
    span = (int(jnp.min(Y)), int(jnp.max(Y)))
    Wb, Ub = jax.vmap(lambda y: gather_bin_bounds(y, bb))(Y)
    # bin-midpoint dequantization for the warm start (clip the one-sided
    # outer bins to the table edges; map back to linear for log tables)
    mid = (jnp.clip(Wb, bb[0], bb[-1]) + jnp.clip(Ub, bb[0], bb[-1])) / 2
    Td = mid if offset is None else jnp.maximum(jnp.exp(mid) - offset, 0.0)
    t1 = time.time()
    if offset is None:
        T_hat = solve_lin(Wb, Ub, mask, T, Td, jnp.float32(sigma))
    else:
        T_hat = solve_log(Wb, Ub, mask, T, Td, jnp.float32(sigma),
                          jnp.float32(offset))
    # per-map likelihood gain recalibration (solvers/calibrate.py): the
    # ordinal likelihood's outer bins are one-sided, so the free-factor
    # fit's global amplitude is weakly identified at low bit depths —
    # gamma* = argmin_gamma masked-NLL restores it without ground truth
    cal = jax.jit(jax.vmap(lambda th, y, m: recalibrate_gain(
        th, y, bb, sigma, 0.0 if offset is None else offset, m,
        linear=offset is None)[1]))
    T_cal = cal(T_hat, Y, mask)
    e = np.asarray(jax.vmap(nmse)(T_cal, T))
    el = np.asarray(jax.vmap(
        lambda a, b: nmse_log(a, b, METRIC_OFFSET))(T_cal, T))
    e_raw = np.asarray(jax.vmap(nmse)(T_hat, T))
    dt = time.time() - t1
    results[label] = {
        "bits": bits, "num_bins": len(bb_t) - 1, "sigma": float(sigma),
        "domain": "linear" if offset is None else "log",
        "bin_span_observed": span,
        "nmse_mean": round(float(e.mean()), 4),
        "nmse_median": round(float(np.median(e)), 4),
        "nmse_raw_mean": round(float(e_raw.mean()), 4),
        "nmse_log_mean": round(float(el.mean()), 4),
        "nmse_log_median": round(float(np.median(el)), 4),
        "wall_s": round(dt, 1),
    }
    log(f"{label}: NMSE {e.mean():.4f} (raw {e_raw.mean():.4f}) "
        f"NMSE_LOG {el.mean():.4f} (bins seen {span}, {dt:.0f}s)")

if _only:
    # probe mode: skip the floor + kernel sections, don't clobber the
    # committed artifact
    with open("/tmp/BITS_PROBE.json", "w") as f:
        json.dump(results, f, indent=1)
    log("probe mode: wrote /tmp/BITS_PROBE.json")
    raise SystemExit(0)

e, el = solve_floor(mask, T)
e = np.asarray(jax.device_get(e))
el = np.asarray(jax.device_get(el))
results["unquantized floor"] = {
    "bits": None, "num_bins": None, "sigma": 0.0, "domain": "linear",
    "nmse_mean": round(float(e.mean()), 4),
    "nmse_median": round(float(np.median(e)), 4),
    "nmse_log_mean": round(float(el.mean()), 4),
    "nmse_log_median": round(float(np.median(el)), 4),
}
log(f"unquantized floor: NMSE {e.mean():.4f} NMSE_LOG {el.mean():.4f}")

# ---- (W,U)-kernel throughput at the 256-bin operating point -------------
from quantized_spectrum_cartography_tpu.ops.pallas import (
    fused_quantized_nll, pack_bounds)

K, I, J = 64, 51, 51
bb256 = jnp.asarray(np.array(B.QUANTIZATION_BOUNDARIES_256_BINS_UNIFORM),
                    jnp.float32)
sigma256 = float(B.SD_256_BINS_UNIFORM)
Y1 = jax.vmap(lambda t, k: quantize(k, t, sigma256, bb256))(
    T[:1], jax.random.split(jax.random.PRNGKey(5), 1))[0]
W1, U1 = pack_bounds(Y1, bb256, mask[0])
Sp = pad_spatial(jnp.asarray(
    np.random.default_rng(0).uniform(0, 0.05, (R, I * J)).astype(
        np.float32)))
Cp = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (K, R)).astype(
    np.float32))
Bn, CHAIN = 128, 10
Wb_ = jnp.broadcast_to(W1, (Bn,) + W1.shape)
Ub_ = jnp.broadcast_to(U1, (Bn,) + U1.shape)
Sb = jnp.broadcast_to(Sp, (Bn,) + Sp.shape)
Cb = jnp.broadcast_to(Cp, (Bn,) + Cp.shape)
vfwd = jax.vmap(lambda s, c, w, u: fused_quantized_nll(
    s, c, w, u, sigma256, 0.0, False, True, None, "pallas"))


@jax.jit
def chain(s0):
    def link(s, _):
        nll = vfwd(s, Cb, Wb_, Ub_)
        return s + 1e-20 * nll[:, None, None], jnp.sum(nll)
    s, nlls = jax.lax.scan(link, s0, None, length=CHAIN)
    return jnp.sum(nlls) + jnp.sum(s[0, 0, :1])


t1 = time.time()
v = float(chain(Sb))
log(f"256-bin kernel compiled in {time.time()-t1:.0f}s (value {v:.3e})")
t1 = time.time()
float(chain(Sb))
dt = (time.time() - t1) / CHAIN
gbps = 2 * Wb_.size * 4 / dt / 1e9
results["kernel_256bin"] = {
    "fwd_ms_b128": round(dt * 1e3, 2),
    "fwd_gbps_raw": round(gbps, 1),
    "note": "(W,U) layout is bin-count independent: 256-bin multi-bit "
            "runs at the same kernel bandwidth as 4-bin (linear link, "
            "robust log-prob path)",
}
log(f"256-bin (W,U) kernel: {dt*1e3:.2f} ms @B=128, {gbps:.0f} GB/s raw")

with open("/root/repo/BITS_SWEEP.json", "w") as f:
    json.dump({
        "config": {"batch": BATCH, "fraction": FRACTION, "iters": ITERS,
                   "lr": LR, "R": R, "metric_offset": METRIC_OFFSET,
                   "midpoint_tether": TETHER, "sigma_anneal": ANNEAL},
        "results": results,
    }, f, indent=1)
log("wrote BITS_SWEEP.json")
