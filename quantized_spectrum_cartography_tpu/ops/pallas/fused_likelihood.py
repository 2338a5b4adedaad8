"""Fused quantized-likelihood Pallas TPU kernel.

The reference's hot loop (qmc.ipynb cell 1; SURVEY.md section 3.1) per
iteration materializes, at torch speed: the rank-R reconstruction (Python
loops over R and K), log link, boundary gather, two erf evaluations, log,
mask multiply, and reduction — each a separate pass over the [K, I, J]
tensor.  This kernel computes the whole masked negative log-likelihood

    nll(S, C) = -sum_k,p  log( Phi((U - x)/s) - Phi((W - x)/s) ),
    x = log( (C @ S)[k,p] + offset )

in ONE pass: the (K,R)x(R,IJ) contraction runs on the MXU and the entire
elementwise chain + reduction stays in VMEM/VPU registers — no [K, IJ]
intermediate ever touches HBM.  The custom VJP recomputes x (cheaper than
storing it) and fuses the analytic gradient

    d nll/dX = (phi(a) - phi(b)) / (s * P) * 1/(X + offset),
    dS = C^T dX,  dC = dX S^T

into a second single pass.  The observation mask is folded into the
boundary tensors (W,U) = (-MASK_SENTINEL, +MASK_SENTINEL) for unobserved
entries, which makes log P = 0 and its gradient 0 exactly — saving a
third of the kernel's HBM traffic (no separate mask tensor).

Layout: spatial dims flattened and padded to a lane multiple
(51*51 = 2601 -> 2688 = 21*128); padding uses the same sentinel fold.

On non-TPU backends the public entry point falls back to an identical
pure-jnp implementation (also used as the parity oracle in tests).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quantized_spectrum_cartography_tpu.ops.likelihood import _SIGMA_EFF

MASK_SENTINEL = 1e4     # |log-domain values| are < 30; +-1e4 => logP = 0
_LOG_SQRT_2PI = 0.9189385332046727
_HIGH = jax.lax.Precision.HIGHEST


# --------------------------------------------------------------------------
# numerics shared by kernel and reference path (pure jnp -> lowers in pallas)
# --------------------------------------------------------------------------

# The axon Mosaic lowering implements only basic elementwise primitives:
# no erf/erfc/expm1/log1p/sign.  All kernel numerics below stick to
# exp/log/abs/min/max/where/polynomials (each failed primitive costs an
# ~8-minute remote recompile round-trip to discover).

def _erf(z: jnp.ndarray) -> jnp.ndarray:
    """erf via the Abramowitz & Stegun 7.1.26 rational polynomial
    (max abs error 1.5e-7, right at f32 resolution)."""
    az = jnp.abs(z)
    u = 1.0 / (1.0 + 0.3275911 * az)
    poly = u * (0.254829592 + u * (-0.284496736 + u * (
        1.421413741 + u * (-1.453152027 + u * 1.061405429))))
    val = 1.0 - poly * jnp.exp(-az * az)
    return jnp.where(z >= 0.0, val, -val)


def _log1mexp(d: jnp.ndarray) -> jnp.ndarray:
    """log(1 - e^d) for d <= -1e-12, without expm1/log1p.

    |d| < log 2: 1-e^d = -d(1 + d/2 + d^2/6 + d^3/24 + d^4/120) (series);
    else: log(1 - e^d) directly (e^d <= 0.5, no cancellation).
    """
    d_small = jnp.clip(d, -0.6931472, -1e-12)
    series = 1.0 + d_small * (0.5 + d_small * (
        1.0 / 6.0 + d_small * (1.0 / 24.0 + d_small / 120.0)))
    small_val = jnp.log(-d_small * series)
    d_large = jnp.minimum(d, -0.6931472)
    large_val = jnp.log(1.0 - jnp.exp(d_large))
    return jnp.where(d > -0.6931472, small_val, large_val)


def _log_ndtr(t: jnp.ndarray) -> jnp.ndarray:
    """Stable log Phi(t) in f32, Pallas-lowerable (exp/log/polys only).

    t > -4:  log1p(erf(t/sqrt2)) - log 2
    t <= -4: Mills asymptotic  -t^2/2 - log(-t) - log sqrt(2pi)
             + log(1 - 1/t^2 + 3/t^4 - 15/t^6)   (rel err < 1e-3 at t=-4)
    """
    tc = jnp.minimum(t, 0.0)            # t>0 handled by the direct branch
    t2 = tc * tc
    safe_t = jnp.minimum(tc, -4.0)
    inv2 = 1.0 / (safe_t * safe_t)
    series = 1.0 - inv2 * (1.0 - 3.0 * inv2 * (1.0 - 5.0 * inv2))
    asym = (-0.5 * t2 - jnp.log(-safe_t) - _LOG_SQRT_2PI
            + jnp.log(series))
    # double-where: clamp the direct branch's input so its (unselected)
    # value/grad stays finite in the deep tail — else autodiff produces
    # 0 * inf = NaN at masked/sentinel entries.  log(1+erf) in place of
    # log1p: at the t=-4 branch point 1+erf ~ 6e-5, so the f32 addition
    # costs ~1e-3 relative on Phi — within the A&S polynomial's own error.
    t_dir = jnp.maximum(t, -4.0)
    direct = (jnp.log(1.0 + _erf(t_dir * 0.7071067811865476))
              - 0.6931471805599453)
    return jnp.where(t <= -4.0, asym, direct)


def _log_prob(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """log(Phi(b) - Phi(a)), b > a, stable in both tails (see
    ops/likelihood.log_prob_probit_bounds)."""
    flip = (a + b) > 0.0
    lo = jnp.where(flip, -b, a)
    hi = jnp.where(flip, -a, b)
    l_lo = _log_ndtr(lo)
    l_hi = _log_ndtr(hi)
    diff = jnp.minimum(l_lo - l_hi, -1e-12)
    return l_hi + _log1mexp(diff)


def _dlogp_dx(a: jnp.ndarray, b: jnp.ndarray, logP: jnp.ndarray,
              inv_s: jnp.ndarray) -> jnp.ndarray:
    """d log P / dx = (phi(a) - phi(b)) / (s P), via exp-of-log-differences
    so the tail ratios stay finite (each term ~ hazard rate)."""
    log_phi_a = -0.5 * a * a - _LOG_SQRT_2PI
    log_phi_b = -0.5 * b * b - _LOG_SQRT_2PI
    ra = jnp.exp(jnp.minimum(log_phi_a - logP, 30.0))
    rb = jnp.exp(jnp.minimum(log_phi_b - logP, 30.0))
    return (ra - rb) * inv_s


def _log_prob_fast(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Direct-form log(Phi(b) - Phi(a)) = log((erf(b/sqrt2)-erf(a/sqrt2))/2).

    3 transcendentals/element vs ~13 for the robust path; valid when
    |z|-scores stay out of the deep tail (sigma >= ~1: the multi-bit log
    boundaries span ~22, so |z| <= 22/sigma and erf differences stay far
    above f32 tiny).  Floor keeps masked/sentinel entries at logP ~ log2e-38
    -- still exactly-zero gradient since both phi terms underflow first.
    """
    ea = _erf(a * 0.7071067811865476)
    eb = _erf(b * 0.7071067811865476)
    return jnp.log(jnp.maximum(0.5 * (eb - ea), 1e-38))


def _fast_ok(sigma: float) -> bool:
    """Auto rule: the log-domain boundary span is ~25, so worst-case
    |z| ~ 25/sigma; the direct erf difference stays above f32 tiny for
    |z| <~ 12  =>  fast path iff sigma >= 2."""
    return float(sigma) >= 2.0


# --------------------------------------------------------------------------
# pallas kernels
# --------------------------------------------------------------------------

def _fwd_kernel(s_ref, c_ref, w_ref, u_ref, out_ref, *, sigma, offset,
                linear, fast):
    inv_s = 1.0 / (sigma * _SIGMA_EFF)
    X = jnp.dot(c_ref[:], s_ref[:], preferred_element_type=jnp.float32)
    x = X if linear else jnp.log(X + offset)
    a = (w_ref[:] - x) * inv_s
    b = (u_ref[:] - x) * inv_s
    lp = _log_prob_fast(a, b) if fast else _log_prob(a, b)
    out_ref[0, 0] = -jnp.sum(lp)


def _bwd_kernel(s_ref, c_ref, w_ref, u_ref, g_ref, ds_ref, dc_ref,
                *, sigma, offset, linear, fast):
    inv_s = 1.0 / (sigma * _SIGMA_EFF)
    S = s_ref[:]
    C = c_ref[:]
    X = jnp.dot(C, S, preferred_element_type=jnp.float32)
    Xo = X + offset
    x = X if linear else jnp.log(Xo)
    a = (w_ref[:] - x) * inv_s
    b = (u_ref[:] - x) * inv_s
    logP = _log_prob_fast(a, b) if fast else _log_prob(a, b)
    # nll = -sum logP  =>  d nll/dX = -(dlogP/dx) * dx/dX
    # dx/dX = 1 (linear link) or 1/Xo (log link)
    dlogp = _dlogp_dx(a, b, logP, inv_s)
    dX = -g_ref[0, 0] * (dlogp if linear else dlogp / Xo)
    ds_ref[:] = jnp.dot(C.T, dX, preferred_element_type=jnp.float32)
    dc_ref[:] = jnp.dot(dX, S.T, preferred_element_type=jnp.float32)


def _pad_to(x: jnp.ndarray, mult: int, value: float) -> jnp.ndarray:
    p = (-x.shape[-1]) % mult
    if p == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, p)]
    return jnp.pad(x, pad, constant_values=value)


def pack_bounds(
    Y: jnp.ndarray,
    bin_boundaries: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    lane_multiple: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Precompute (W, U) [K, IJp] for the kernel from bin indices Y [K,I,J]
    (or already-flat [K, IJ]), folding mask and lane padding into the
    +-MASK_SENTINEL no-op bins.  Do this ONCE per solve: Y is constant."""
    bb = jnp.asarray(bin_boundaries, jnp.float32)
    K = Y.shape[0]
    Yf = Y.reshape(K, -1)
    W = bb[Yf]
    U = bb[Yf + 1]
    if mask is not None:
        mf = mask.reshape(K, -1) > 0
        W = jnp.where(mf, W, -MASK_SENTINEL)
        U = jnp.where(mf, U, MASK_SENTINEL)
    W = _pad_to(W, lane_multiple, -MASK_SENTINEL)
    U = _pad_to(U, lane_multiple, MASK_SENTINEL)
    return W, U


def pack_bounds_1bit(
    y01: jnp.ndarray,
    mean: float,
    mask: Optional[jnp.ndarray] = None,
    lane_multiple: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """1-bit observations as the 2-bin ordinal case (linear link):
    y=1 -> (W,U)=(mean,+inf), y=0 -> (-inf,mean), so
    -logP = -log Phi(+-(X-mean)/s) — the reference's probit BCE up to the
    mean/sum reduction (quantization_model.py:97-113)."""
    K = y01.shape[0]
    yf = y01.reshape(K, -1) > 0.5
    W = jnp.where(yf, jnp.float32(mean), -MASK_SENTINEL)
    U = jnp.where(yf, MASK_SENTINEL, jnp.float32(mean))
    if mask is not None:
        mf = mask.reshape(K, -1) > 0
        W = jnp.where(mf, W, -MASK_SENTINEL)
        U = jnp.where(mf, U, MASK_SENTINEL)
    W = _pad_to(W, lane_multiple, -MASK_SENTINEL)
    U = _pad_to(U, lane_multiple, MASK_SENTINEL)
    return W, U


# --------------------------------------------------------------------------
# public entry point with custom VJP
# --------------------------------------------------------------------------

def _use_pallas(mode: str = "auto") -> bool:
    """mode: 'auto' (Pallas iff on TPU), 'pallas' (force), 'xla' (force the
    pure-jnp analytic-VJP path even on TPU — same math and custom backward,
    compiled by XLA instead of Mosaic; useful where the remote Mosaic
    compile latency outweighs the kernel's steady-state win)."""
    if mode == "pallas":
        return True
    if mode == "xla":
        return False
    return jax.default_backend() == "tpu"


def _fwd_pallas(S_flat, C, W, U, sigma, offset, linear, fast, interpret):
    K, IJp = W.shape
    R = S_flat.shape[0]
    nll = pl.pallas_call(
        functools.partial(_fwd_kernel, sigma=sigma, offset=offset,
                          linear=linear, fast=fast),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * K * R * IJp + 25 * K * IJp,
            bytes_accessed=4 * (K * IJp * 2 + K * R + R * IJp),
            transcendentals=4 * K * IJp),
    )(S_flat, C, W, U)
    return nll[0, 0]


def _bwd_pallas(S_flat, C, W, U, g, sigma, offset, linear, fast, interpret):
    K, IJp = W.shape
    R = S_flat.shape[0]
    g2 = g.reshape(1, 1).astype(jnp.float32)
    dS, dC = pl.pallas_call(
        functools.partial(_bwd_kernel, sigma=sigma, offset=offset,
                          linear=linear, fast=fast),
        out_shape=(jax.ShapeDtypeStruct((R, IJp), jnp.float32),
                   jax.ShapeDtypeStruct((K, R), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * K * R * IJp + 30 * K * IJp,
            bytes_accessed=4 * (K * IJp * 2 + 2 * (K * R + R * IJp)),
            transcendentals=5 * K * IJp),
    )(S_flat, C, W, U, g2)
    return dS, dC


def _nll_jnp(S_flat, C, W, U, sigma, offset, linear=False, fast=False):
    inv_s = 1.0 / (sigma * _SIGMA_EFF)
    X = jnp.matmul(C, S_flat, precision=_HIGH)
    x = X if linear else jnp.log(X + offset)
    a = (W - x) * inv_s
    b = (U - x) * inv_s
    lp = _log_prob_fast(a, b) if fast else _log_prob(a, b)
    return -jnp.sum(lp)


def fused_nll_reference(S_flat, C, W, U, sigma, offset, linear=False,
                        fast=False):
    """Pure-jnp oracle with identical math (autodiff-able)."""
    return _nll_jnp(S_flat, C, W, U, sigma, offset, linear, fast)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def fused_quantized_nll(
    S_flat: jnp.ndarray,     # [R, IJp]
    C: jnp.ndarray,          # [K, R]
    W: jnp.ndarray,          # [K, IJp]  from pack_bounds
    U: jnp.ndarray,          # [K, IJp]
    sigma: float,
    offset: float,
    interpret: bool = False,
    linear: bool = False,
    fast: Optional[bool] = None,
    mode: str = "auto",
) -> jnp.ndarray:
    """Masked quantized-observation NLL of factors (S, C); scalar.

    linear=True uses the identity link (x = C@S), whose 2-bin case is the
    reference's 1-bit probit BCE (quantization_model.py NegLikelihood up
    to the mean-vs-sum reduction); linear=False applies the log link.
    fast=None auto-selects the 3-transcendental direct erf-difference
    formulation when sigma is large enough that z-scores stay out of the
    deep tail (_fast_ok); the robust log-space path otherwise.
    Differentiable in S_flat and C via the fused analytic backward pass.
    """
    fast = _fast_ok(sigma) if fast is None else fast
    if _use_pallas(mode) or interpret:
        return _fwd_pallas(S_flat, C, W, U, sigma, offset, linear, fast,
                           interpret=interpret)
    return _nll_jnp(S_flat, C, W, U, sigma, offset, linear, fast)


def _vjp_fwd(S_flat, C, W, U, sigma, offset, interpret, linear, fast,
             mode="auto"):
    out = fused_quantized_nll(S_flat, C, W, U, sigma, offset, interpret,
                              linear, fast, mode)
    return out, (S_flat, C, W, U)


def _vjp_bwd(sigma, offset, interpret, linear, fast, mode, res, g):
    S_flat, C, W, U = res
    fast = _fast_ok(sigma) if fast is None else fast
    if _use_pallas(mode) or interpret:
        dS, dC = _bwd_pallas(S_flat, C, W, U, g, sigma, offset, linear,
                             fast, interpret=interpret)
    else:
        inv_s = 1.0 / (sigma * _SIGMA_EFF)
        X = jnp.matmul(C, S_flat, precision=_HIGH)
        Xo = X + offset
        x = X if linear else jnp.log(Xo)
        a = (W - x) * inv_s
        b = (U - x) * inv_s
        logP = _log_prob_fast(a, b) if fast else _log_prob(a, b)
        dlogp = _dlogp_dx(a, b, logP, inv_s)
        dX = -g * (dlogp if linear else dlogp / Xo)
        dS = jnp.matmul(C.T, dX, precision=_HIGH)
        dC = jnp.matmul(dX, S_flat.T, precision=_HIGH)
    return dS, dC, None, None


fused_quantized_nll.defvjp(_vjp_fwd, _vjp_bwd)


# --------------------------------------------------------------------------
# Coded-observation kernels: int8 bin codes instead of f32 (W, U) tensors
# --------------------------------------------------------------------------
#
# The (W, U) layout reads 8 bytes per entry per pass for what is only a
# few bits of information (the bin index).  These kernels read a single
# int8 code tensor (bin index; code == nbins means masked/padded) and
# reconstruct the boundary pair in-register from compile-time constants
# with a select chain (nbins <= 16, so <= 2x15 VPU selects — far cheaper
# than the 8x HBM traffic).  Forward/backward math is identical to the
# (W, U) kernels above.

_CODED_MAX_BINS = 32


def pack_codes(
    Y: jnp.ndarray,
    num_bins: int,
    mask: Optional[jnp.ndarray] = None,
    lane_multiple: int = 128,
) -> jnp.ndarray:
    """int8 bin-code tensor [K, IJp] for the coded kernels.

    Y [K,I,J] (or flat [K,IJ]) int bin indices in [0, num_bins); masked
    and lane-padding entries get code == num_bins (exact no-op: logP = 0,
    gradient = 0).  Do this ONCE per solve."""
    if num_bins >= _CODED_MAX_BINS:
        raise ValueError(f"num_bins {num_bins} > {_CODED_MAX_BINS}")
    K = Y.shape[0]
    Yf = Y.reshape(K, -1).astype(jnp.int32)
    if mask is not None:
        mf = mask.reshape(K, -1) > 0
        Yf = jnp.where(mf, Yf, num_bins)
    Yf = _pad_to(Yf, lane_multiple, num_bins)
    return Yf.astype(jnp.int8)


def pack_codes_1bit(
    y01: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    lane_multiple: int = 128,
) -> jnp.ndarray:
    """1-bit observations as 2-bin codes: y=0 -> 0, y=1 -> 1, masked -> 2."""
    K = y01.shape[0]
    yf = (y01.reshape(K, -1) > 0.5).astype(jnp.int32)
    if mask is not None:
        mf = mask.reshape(K, -1) > 0
        yf = jnp.where(mf, yf, 2)
    yf = _pad_to(yf, lane_multiple, 2)
    return yf.astype(jnp.int8)


def _bounds_from_codes(codes_i32, bb_vals):
    """(W, U) from int32 codes via compile-time select chains.

    bb_vals: python tuple of nbins+1 boundary floats (first/last may be
    +-MASK_SENTINEL already for unbounded outer bins).  code == nbins maps
    to (-SENTINEL, +SENTINEL) => logP = 0 and zero gradient."""
    n = len(bb_vals) - 1
    W = jnp.full(codes_i32.shape, -MASK_SENTINEL, jnp.float32)
    U = jnp.full(codes_i32.shape, MASK_SENTINEL, jnp.float32)
    for i in range(n):
        sel = codes_i32 == i
        W = jnp.where(sel, jnp.float32(bb_vals[i]), W)
        U = jnp.where(sel, jnp.float32(bb_vals[i + 1]), U)
    return W, U


def _fwd_kernel_coded(s_ref, c_ref, y_ref, out_ref, *, bb_vals, sigma,
                      offset, linear, fast):
    inv_s = 1.0 / (sigma * _SIGMA_EFF)
    X = jnp.dot(c_ref[:], s_ref[:], preferred_element_type=jnp.float32)
    x = X if linear else jnp.log(X + offset)
    W, U = _bounds_from_codes(y_ref[:].astype(jnp.int32), bb_vals)
    a = (W - x) * inv_s
    b = (U - x) * inv_s
    lp = _log_prob_fast(a, b) if fast else _log_prob(a, b)
    out_ref[0, 0] = -jnp.sum(lp)


def _bwd_kernel_coded(s_ref, c_ref, y_ref, g_ref, ds_ref, dc_ref,
                      *, bb_vals, sigma, offset, linear, fast):
    inv_s = 1.0 / (sigma * _SIGMA_EFF)
    S = s_ref[:]
    C = c_ref[:]
    X = jnp.dot(C, S, preferred_element_type=jnp.float32)
    Xo = X + offset
    x = X if linear else jnp.log(Xo)
    W, U = _bounds_from_codes(y_ref[:].astype(jnp.int32), bb_vals)
    a = (W - x) * inv_s
    b = (U - x) * inv_s
    logP = _log_prob_fast(a, b) if fast else _log_prob(a, b)
    dlogp = _dlogp_dx(a, b, logP, inv_s)
    dX = -g_ref[0, 0] * (dlogp if linear else dlogp / Xo)
    ds_ref[:] = jnp.dot(C.T, dX, preferred_element_type=jnp.float32)
    dc_ref[:] = jnp.dot(dX, S.T, preferred_element_type=jnp.float32)


def _coded_cost(K, R, IJp, bwd=False):
    # int8 codes: 1 byte/entry; everything else as the (W,U) kernels
    return pl.CostEstimate(
        flops=(6 if bwd else 2) * K * R * IJp + (30 if bwd else 25) * K * IJp,
        bytes_accessed=K * IJp * (1 + 4) + 4 * (K * R + R * IJp) * (2 if bwd else 1),
        transcendentals=(5 if bwd else 4) * K * IJp)


def _fwd_pallas_coded(S_flat, C, Yc, bb_vals, sigma, offset, linear, fast,
                      interpret):
    K, IJp = Yc.shape
    R = S_flat.shape[0]
    nll = pl.pallas_call(
        functools.partial(_fwd_kernel_coded, bb_vals=bb_vals, sigma=sigma,
                          offset=offset, linear=linear, fast=fast),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=interpret,
        cost_estimate=_coded_cost(K, R, IJp),
    )(S_flat, C, Yc)
    return nll[0, 0]


def _bwd_pallas_coded(S_flat, C, Yc, g, bb_vals, sigma, offset, linear,
                      fast, interpret):
    K, IJp = Yc.shape
    R = S_flat.shape[0]
    g2 = g.reshape(1, 1).astype(jnp.float32)
    dS, dC = pl.pallas_call(
        functools.partial(_bwd_kernel_coded, bb_vals=bb_vals, sigma=sigma,
                          offset=offset, linear=linear, fast=fast),
        out_shape=(jax.ShapeDtypeStruct((R, IJp), jnp.float32),
                   jax.ShapeDtypeStruct((K, R), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
        cost_estimate=_coded_cost(K, R, IJp, bwd=True),
    )(S_flat, C, Yc, g2)
    return dS, dC


def _nll_jnp_coded(S_flat, C, Yc, bb_vals, sigma, offset, linear, fast):
    inv_s = 1.0 / (sigma * _SIGMA_EFF)
    X = jnp.matmul(C, S_flat, precision=_HIGH)
    x = X if linear else jnp.log(X + offset)
    W, U = _bounds_from_codes(Yc.astype(jnp.int32), bb_vals)
    a = (W - x) * inv_s
    b = (U - x) * inv_s
    lp = _log_prob_fast(a, b) if fast else _log_prob(a, b)
    return -jnp.sum(lp)


def onebit_bounds(mean: float) -> Tuple[float, float, float]:
    """Boundary tuple for the 1-bit linear-link case (2 bins split at
    `mean`): codes 0 -> (-inf, mean), 1 -> (mean, +inf)."""
    return (-MASK_SENTINEL, float(mean), MASK_SENTINEL)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def fused_quantized_nll_coded(
    S_flat: jnp.ndarray,      # [R, IJp]
    C: jnp.ndarray,           # [K, R]
    Yc: jnp.ndarray,          # [K, IJp] int8 codes from pack_codes*
    bb_vals: Tuple[float, ...],
    sigma: float,
    offset: float,
    interpret: bool = False,
    linear: bool = False,
    fast: Optional[bool] = None,
    mode: str = "auto",
) -> jnp.ndarray:
    """Coded-observation variant of `fused_quantized_nll`: identical math,
    1 byte of observation traffic per entry instead of 8.  bb_vals must be
    a hashable python tuple of nbins+1 floats (compile-time constants);
    use `onebit_bounds(mean)` for the 1-bit case."""
    fast = _fast_ok(sigma) if fast is None else fast
    if _use_pallas(mode) or interpret:
        return _fwd_pallas_coded(S_flat, C, Yc, bb_vals, sigma, offset,
                                 linear, fast, interpret=interpret)
    return _nll_jnp_coded(S_flat, C, Yc, bb_vals, sigma, offset, linear,
                          fast)


def _vjp_fwd_coded(S_flat, C, Yc, bb_vals, sigma, offset, interpret,
                   linear, fast, mode="auto"):
    out = fused_quantized_nll_coded(S_flat, C, Yc, bb_vals, sigma, offset,
                                    interpret, linear, fast, mode)
    return out, (S_flat, C, Yc)


def _vjp_bwd_coded(bb_vals, sigma, offset, interpret, linear, fast, mode,
                   res, g):
    S_flat, C, Yc = res
    fast = _fast_ok(sigma) if fast is None else fast
    if _use_pallas(mode) or interpret:
        dS, dC = _bwd_pallas_coded(S_flat, C, Yc, g, bb_vals, sigma,
                                   offset, linear, fast,
                                   interpret=interpret)
    else:
        inv_s = 1.0 / (sigma * _SIGMA_EFF)
        X = jnp.matmul(C, S_flat, precision=_HIGH)
        Xo = X + offset
        x = X if linear else jnp.log(Xo)
        W, U = _bounds_from_codes(Yc.astype(jnp.int32), bb_vals)
        a = (W - x) * inv_s
        b = (U - x) * inv_s
        logP = _log_prob_fast(a, b) if fast else _log_prob(a, b)
        dlogp = _dlogp_dx(a, b, logP, inv_s)
        dX = -g * (dlogp if linear else dlogp / Xo)
        dS = jnp.matmul(C.T, dX, precision=_HIGH)
        dC = jnp.matmul(dX, S_flat.T, precision=_HIGH)
    return dS, dC, None


fused_quantized_nll_coded.defvjp(_vjp_fwd_coded, _vjp_bwd_coded)


# --------------------------------------------------------------------------
# 1-bit specialized kernels: logPhi(sign * x), half the generic VPU work
# --------------------------------------------------------------------------
#
# The generic ordinal kernel evaluates TWO _log_ndtr's plus a stable
# log(1-e^d) per element; for 1-bit observations one boundary of every bin
# is +-inf, so  logP = logPhi(sign * (X - mean)/s)  with sign in {-1,0,+1}
# (0 = masked: logP and gradient exactly zero).  These kernels read the
# same int8 codes as the coded ordinal kernels ({0,1,2=masked}) and run
# one _log_ndtr forward / one _log_ndtr + one exp backward.

def _sign_weight_from_codes(codes_i32):
    sgn = jnp.where(codes_i32 == 1, 1.0, jnp.where(codes_i32 == 0, -1.0, 0.0))
    return sgn


def _hazard_ratio(t: jnp.ndarray) -> jnp.ndarray:
    """phi(t)/Phi(t) directly, Pallas-lowerable, cheaper than
    exp(log phi - log Phi):

    t >= -4:  exp(-t^2/2 - log sqrt(2pi)) / (0.5 (1 + erf(t/sqrt2)))
              (1+erf loses ~0.5% relative at the -4 boundary — fine for a
              gradient);
    t <  -4:  Mills asymptotic  -t / (1 - 1/t^2 + 3/t^4 - 15/t^6)
              (rel err < 2e-3 at t=-4, no transcendentals).
    The double-where keeps the unselected branch finite so the select's
    unused lane cannot produce inf*0."""
    t_dir = jnp.maximum(t, -4.0)
    num = jnp.exp(-0.5 * t_dir * t_dir - _LOG_SQRT_2PI)
    den = 0.5 * (1.0 + _erf(t_dir * 0.7071067811865476))
    direct = num / jnp.maximum(den, 1e-30)
    safe_t = jnp.minimum(t, -4.0)
    inv2 = 1.0 / (safe_t * safe_t)
    series = 1.0 - inv2 * (1.0 - 3.0 * inv2 * (1.0 - 5.0 * inv2))
    tail = -safe_t / series
    return jnp.where(t < -4.0, tail, direct)


def _fwd_kernel_1bit(s_ref, c_ref, y_ref, out_ref, *, mean, sigma):
    inv_s = 1.0 / (sigma * _SIGMA_EFF)
    X = jnp.dot(c_ref[:], s_ref[:], preferred_element_type=jnp.float32)
    sgn = _sign_weight_from_codes(y_ref[:].astype(jnp.int32))
    t = sgn * ((X - mean) * inv_s)
    out_ref[0, 0] = -jnp.sum(jnp.abs(sgn) * _log_ndtr(t))


def _bwd_kernel_1bit(s_ref, c_ref, y_ref, g_ref, ds_ref, dc_ref,
                     *, mean, sigma):
    inv_s = 1.0 / (sigma * _SIGMA_EFF)
    S = s_ref[:]
    C = c_ref[:]
    X = jnp.dot(C, S, preferred_element_type=jnp.float32)
    sgn = _sign_weight_from_codes(y_ref[:].astype(jnp.int32))
    t = sgn * ((X - mean) * inv_s)
    dX = g_ref[0, 0] * (-inv_s) * sgn * _hazard_ratio(t)
    ds_ref[:] = jnp.dot(C.T, dX, preferred_element_type=jnp.float32)
    dc_ref[:] = jnp.dot(dX, S.T, preferred_element_type=jnp.float32)


def _fwd_pallas_1bit(S_flat, C, Yc, mean, sigma, interpret):
    K, IJp = Yc.shape
    R = S_flat.shape[0]
    nll = pl.pallas_call(
        functools.partial(_fwd_kernel_1bit, mean=mean, sigma=sigma),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * K * R * IJp + 15 * K * IJp,
            bytes_accessed=K * IJp * 5 + 4 * (K * R + R * IJp),
            transcendentals=2 * K * IJp),
    )(S_flat, C, Yc)
    return nll[0, 0]


def _bwd_pallas_1bit(S_flat, C, Yc, g, mean, sigma, interpret):
    K, IJp = Yc.shape
    R = S_flat.shape[0]
    g2 = g.reshape(1, 1).astype(jnp.float32)
    dS, dC = pl.pallas_call(
        functools.partial(_bwd_kernel_1bit, mean=mean, sigma=sigma),
        out_shape=(jax.ShapeDtypeStruct((R, IJp), jnp.float32),
                   jax.ShapeDtypeStruct((K, R), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * K * R * IJp + 20 * K * IJp,
            bytes_accessed=K * IJp * 5 + 8 * (K * R + R * IJp),
            transcendentals=3 * K * IJp),
    )(S_flat, C, Yc, g2)
    return dS, dC


def _nll_jnp_1bit(S_flat, C, Yc, mean, sigma):
    inv_s = 1.0 / (sigma * _SIGMA_EFF)
    X = jnp.matmul(C, S_flat, precision=_HIGH)
    sgn = _sign_weight_from_codes(Yc.astype(jnp.int32))
    t = sgn * ((X - mean) * inv_s)
    return -jnp.sum(jnp.abs(sgn) * _log_ndtr(t))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_onebit_nll(
    S_flat: jnp.ndarray,     # [R, IJp]
    C: jnp.ndarray,          # [K, R]
    Yc: jnp.ndarray,         # [K, IJp] int8 codes from pack_codes_1bit
    mean: float,
    sigma: float,
    interpret: bool = False,
    mode: str = "auto",
) -> jnp.ndarray:
    """1-bit probit NLL (sum) of the rank-R reconstruction, specialized
    2-bin kernel: logP = logPhi(sign*(X-mean)/s_eff), masked entries (code
    2) contribute exactly zero.  Equals the generic fused kernel on
    `pack_bounds_1bit` bounds (tests/test_pallas_kernel.py) at half the
    in-kernel transcendental work."""
    if _use_pallas(mode) or interpret:
        return _fwd_pallas_1bit(S_flat, C, Yc, mean, sigma,
                                interpret=interpret)
    return _nll_jnp_1bit(S_flat, C, Yc, mean, sigma)


def _vjp_fwd_1bit(S_flat, C, Yc, mean, sigma, interpret, mode="auto"):
    out = fused_onebit_nll(S_flat, C, Yc, mean, sigma, interpret, mode)
    return out, (S_flat, C, Yc)


def _vjp_bwd_1bit(mean, sigma, interpret, mode, res, g):
    S_flat, C, Yc = res
    if _use_pallas(mode) or interpret:
        return _bwd_pallas_1bit(S_flat, C, Yc, g, mean, sigma,
                                interpret=interpret) + (None,)
    inv_s = 1.0 / (sigma * _SIGMA_EFF)
    X = jnp.matmul(C, S_flat, precision=_HIGH)
    sgn = _sign_weight_from_codes(Yc.astype(jnp.int32))
    t = sgn * ((X - mean) * inv_s)
    dX = g * (-inv_s) * sgn * _hazard_ratio(t)
    dS = jnp.matmul(C.T, dX, precision=_HIGH)
    dC = jnp.matmul(dX, S_flat.T, precision=_HIGH)
    return dS, dC, None


fused_onebit_nll.defvjp(_vjp_fwd_1bit, _vjp_bwd_1bit)
