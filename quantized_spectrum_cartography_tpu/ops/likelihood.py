"""Probit / logistic likelihood of ordinal quantized observations.

Re-design of `qmc/quantization_model.py:22-39,97-129` and
`qmc/quantization_model_log.py:23-41`.  Differences from the reference:

- The bin-boundary gather (W = bb[Y], U = bb[Y+1]) is hoisted out of the
  optimization hot loop: Y is constant during recovery, so (W, U, mask) are
  precomputed once and the per-iteration op is a pure fused elementwise pass
  (see `ops/pallas/fused_likelihood.py` for the TPU kernel).
- log P(Y|X) is computed in log-space via `log_ndtr` + expm1, which stays
  finite in f32 where the reference's  log(Phi(u) - Phi(w))  underflows
  (the reference hides this behind CPU float64-ish torch and +-1e5 clamps,
  `quantization_model.py:31-33`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from quantized_spectrum_cartography_tpu.ops.quantizer import (
    F_probit,
    _SQRT2,
)

# Effective probit scale: the reference evaluates erf(y/(std*1.414213)),
# i.e. Phi(y/sigma_eff) with sigma_eff = std*1.414213/sqrt(2).
_SIGMA_EFF = _SQRT2 / 1.4142135623730951


def gather_bin_bounds(
    Y: jnp.ndarray,
    bin_boundaries: jnp.ndarray,
    clamp_outer: Optional[float] = None,
):
    """Lower/upper boundary tensors (W, U) for bin indices Y.

    Reference: `qmc/quantization_model.py:31-35` (linear domain clamps the
    outer boundaries to +-1e5; pass clamp_outer=1e5 for parity, or
    clamp_outer=jnp.inf for the exact unbounded-bin likelihood).  The
    log-domain variant (`quantization_model_log.py:33-37`) uses the stored
    finite boundaries: clamp_outer=None.
    """
    bb = jnp.asarray(bin_boundaries)
    if clamp_outer is not None:
        bb = bb.at[0].set(-clamp_outer).at[-1].set(clamp_outer)
    W = bb[Y]
    U = bb[Y + 1]
    return W, U


def prob_probit(
    Y: jnp.ndarray,
    X_hat: jnp.ndarray,
    bin_boundaries: jnp.ndarray,
    noise_std,
    clamp_outer: Optional[float] = None,
) -> jnp.ndarray:
    """P(Y|X_hat) = Phi(U - X) - Phi(W - X), direct (non-log) form.

    Bitwise-parity path with `qmc/quantization_model.py:22-39`; prefer
    `log_prob_probit` inside solvers.
    """
    W, U = gather_bin_bounds(Y, bin_boundaries, clamp_outer)
    return F_probit(U - X_hat, noise_std) - F_probit(W - X_hat, noise_std)


def log_prob_probit_bounds(
    W: jnp.ndarray, U: jnp.ndarray, X_hat: jnp.ndarray, noise_std
) -> jnp.ndarray:
    """Stable log(Phi((U-X)/s) - Phi((W-X)/s)) from precomputed bounds.

    Uses the symmetric ndtr identity Phi(b)-Phi(a) = Phi(-a)-Phi(-b) to keep
    the anchor term in the *larger* tail, then log-space difference
    log P = log_ndtr(hi) + log(-expm1(log_ndtr(lo) - log_ndtr(hi))).
    """
    s = noise_std * _SIGMA_EFF
    a = (W - X_hat) / s
    b = (U - X_hat) / s
    flip = (a + b) > 0.0
    lo = jnp.where(flip, -b, a)
    hi = jnp.where(flip, -a, b)
    l_lo = jax.scipy.special.log_ndtr(lo)
    l_hi = jax.scipy.special.log_ndtr(hi)
    diff = jnp.minimum(l_lo - l_hi, 0.0)
    tiny = jnp.finfo(X_hat.dtype).tiny
    return l_hi + jnp.log(jnp.maximum(-jnp.expm1(diff), tiny))


def log_prob_probit(
    Y: jnp.ndarray,
    X_hat: jnp.ndarray,
    bin_boundaries: jnp.ndarray,
    noise_std,
    clamp_outer: Optional[float] = None,
) -> jnp.ndarray:
    W, U = gather_bin_bounds(Y, bin_boundaries, clamp_outer)
    return log_prob_probit_bounds(W, U, X_hat, noise_std)


def masked_nll(
    logP: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Negative log-likelihood  -sum(mask * logP)  over observed entries.

    Reference hot-loop expression:
    `-torch.sum(Wx*torch.log(prob_probit(...)))` (qmc/qmc.ipynb cell 1).
    """
    if mask is None:
        return -jnp.sum(logP)
    return -jnp.sum(mask * logP)


def neg_likelihood_1bit(
    T_sample: jnp.ndarray,
    T_target: jnp.ndarray,
    mean,
    std=None,
    probit: bool = True,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """1-bit MLE loss: mean binary cross-entropy of link(T_sample - mean)
    against {0,1} targets.  Reference `NegLikelihood`
    (`qmc/quantization_model.py:97-113`), computed here in log-space
    (BCE(Phi(u), t) = -[t log Phi(u) + (1-t) log Phi(-u)]) instead of
    torch's clamped nn.BCELoss.
    """
    u = T_sample - mean
    # Sign fold: for t in {0,1},  t*logF(u) + (1-t)*logF(-u) = logF((2t-1)*u)
    # for any symmetric link F (probit Phi and the logistic both are).  One
    # transcendental pass over the [K,I,J] tensor instead of two — the 1-bit
    # BCE is the solver hot loop's dominant cost (see bench.py).
    su = (2.0 * T_target - 1.0) * u
    if probit:
        assert std is not None
        s = std * _SIGMA_EFF
        bce = -jax.scipy.special.log_ndtr(su / s)
    else:
        bce = -jax.nn.log_sigmoid(su)
    if mask is None:
        return jnp.mean(bce)
    return jnp.sum(mask * bce) / jnp.maximum(jnp.sum(mask), 1.0)


def deterministic_cost(
    T_hat: jnp.ndarray,
    T_target: jnp.ndarray,
    mean=0.0,
    lambda_reg: float = 0.001,
) -> jnp.ndarray:
    """Max-correlation deterministic cost
    -lambda * sum((T_hat-mean) * T_target) + ||T_hat-mean||_F.
    Reference `DeterministicCost` (`qmc/quantization_model.py:115-129`).
    """
    Tm = T_hat - mean
    return -lambda_reg * jnp.sum(Tm * T_target) + jnp.linalg.norm(Tm.reshape(-1))


# --------------------------------------------------------------------------
# Factor-level 1-bit NLL with analytic VJP (XLA fast path)
# --------------------------------------------------------------------------
#
# Autodiff of  -mean(log_ndtr(sign * (get_tensor(S,C) - mean)/s))  saves the
# [K,I,J] pre-activation (and log_ndtr residuals) to HBM in the forward pass
# and re-reads them in the backward — 2-3 extra full-tensor round trips per
# Adam step.  This custom VJP saves only (S, C): the backward recomputes the
# rank-R reconstruction (one tiny MXU matmul) and applies the analytic
# gradient  d(-logPhi(x))/dx = -phi(x)/Phi(x) = -exp(-x^2/2 - log(sqrt(2pi))
# - log_ndtr(x)),  contracted straight onto the factors.  The {±1, 0}
# sign·mask tensor is carried as int8 (4x less constant traffic than f32).
# This is the XLA analogue of the Pallas kernel in ops/pallas/ — used where
# the Mosaic compile cost is not warranted (see bench.py).

_LOG_SQRT_2PI = 0.9189385332046727


def pack_sign_mask(
    T_target: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """int8 tensor s in {-1, 0, +1}: (2t-1) where observed, 0 elsewhere."""
    s = (2.0 * T_target - 1.0)
    if mask is not None:
        s = s * mask
    return s.astype(jnp.int8)


@jax.custom_vjp
def onebit_nll_factors(
    S: jnp.ndarray,
    C: jnp.ndarray,
    sign_mask: jnp.ndarray,
    mean: jnp.ndarray,
    inv_s: jnp.ndarray,
    inv_count: jnp.ndarray,
) -> jnp.ndarray:
    """Mean 1-bit probit BCE of the rank-R reconstruction.

    S [R,I,J], C [R,K], sign_mask int8 [K,I,J] from `pack_sign_mask`;
    inv_s = 1/(std*_SIGMA_EFF); inv_count = 1/#observed.  Equals
    `neg_likelihood_1bit(get_tensor(S,C), T_target, mean, std, probit=True,
    mask=mask)` (tests/test_likelihood.py).
    """
    nll, _ = _onebit_nll_fwd(S, C, sign_mask, mean, inv_s, inv_count)
    return nll


def _onebit_nll_fwd(S, C, sign_mask, mean, inv_s, inv_count):
    sm = sign_mask.astype(S.dtype)
    x = sm * (jnp.einsum("rij,rk->kij", S, C,
                         precision=jax.lax.Precision.HIGHEST) - mean) * inv_s
    w = jnp.abs(sm)
    nll = -jnp.sum(w * jax.scipy.special.log_ndtr(x)) * inv_count
    return nll, (S, C, sign_mask, mean, inv_s, inv_count)


def _onebit_nll_bwd(res, g):
    S, C, sign_mask, mean, inv_s, inv_count = res
    sm = sign_mask.astype(S.dtype)
    x = sm * (jnp.einsum("rij,rk->kij", S, C,
                         precision=jax.lax.Precision.HIGHEST) - mean) * inv_s
    # hazard ratio phi(x)/Phi(x), exact and finite in f32 for all x
    ratio = jnp.exp(-0.5 * x * x - _LOG_SQRT_2PI
                    - jax.scipy.special.log_ndtr(x))
    # d nll / d T_hat  (sign folds back; |sm| weight is sm*sign)
    dT = g * (-inv_count * inv_s) * sm * ratio
    gS = jnp.einsum("kij,rk->rij", dT, C,
                    precision=jax.lax.Precision.HIGHEST)
    gC = jnp.einsum("kij,rij->rk", dT, S,
                    precision=jax.lax.Precision.HIGHEST)
    return gS, gC, None, None, None, None


onebit_nll_factors.defvjp(_onebit_nll_fwd, _onebit_nll_bwd)
