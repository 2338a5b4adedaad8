"""Recovery quality metrics.

NMSE / NMSE_LOG from `qmc/quantization_model.py:88-92` and
`qmc/quantization_model_log.py:104-111`; SRE / NAE from the MATLAB harness
(`backup/algorithms/joint_opt_ae.m:1020-1035`); NAE also in
`backup/algorithms/nn_descent_gan.py:42-47`; miss/false-detection
probabilities from `joint_opt_ae.m:514-544`.
"""

from __future__ import annotations

import jax.numpy as jnp


def _fro(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(jnp.square(x)))


def nmse(T: jnp.ndarray, T_target: jnp.ndarray) -> jnp.ndarray:
    """||T - T*||_F / ||T*||_F (reference NMSE, `quantization_model.py:88-92`)."""
    return _fro(T - T_target) / _fro(T_target)


def nmse_log(T: jnp.ndarray, T_target: jnp.ndarray, offset: float) -> jnp.ndarray:
    """NMSE after log-link (reference NMSE_LOG, `quantization_model_log.py:104-111`)."""
    Tl = jnp.log(T + offset)
    Tt = jnp.log(T_target + offset)
    return _fro(Tl - Tt) / _fro(Tt)


def sre(X_hat: jnp.ndarray, X_true: jnp.ndarray) -> jnp.ndarray:
    """Squared reconstruction error ||X-X*||_F^2 / ||X*||_F^2
    (joint_opt_ae.m:1020-1022 SRE convention)."""
    return jnp.sum(jnp.square(X_hat - X_true)) / jnp.sum(jnp.square(X_true))


def nae(x_hat: jnp.ndarray, x_true: jnp.ndarray) -> jnp.ndarray:
    """Normalized absolute error between L1-normalized nonneg signals
    (joint_opt_ae.m:1024-1026; nn_descent_gan.py:42-47)."""
    a = x_hat / jnp.maximum(jnp.sum(jnp.abs(x_hat)), 1e-12)
    b = x_true / jnp.maximum(jnp.sum(jnp.abs(x_true)), 1e-12)
    return jnp.sum(jnp.abs(a - b))


def nae_tensor(X_hat: jnp.ndarray, X_true: jnp.ndarray, R: int) -> jnp.ndarray:
    """The MATLAB harness's NAE (joint_opt_ae.m:1014-1016): both tensors
    normalized by their GLOBAL absolute sum, summed absolute difference,
    divided by R.  (Distinct from per-factor `nae`, which normalizes each
    factor separately — nn_descent_gan.py:42-47.)"""
    a = X_hat / jnp.maximum(jnp.sum(jnp.abs(X_hat)), 1e-12)
    b = X_true / jnp.maximum(jnp.sum(jnp.abs(X_true)), 1e-12)
    return jnp.sum(jnp.abs(a - b)) / R


def detection_counts(
    T_hat: jnp.ndarray,
    T_ref: jnp.ndarray,
    peaks_xy: jnp.ndarray,
    miss_threshold: float = 0.25,
    misdetect_threshold: float = 1.75,
    low_level: float = 0.01,
):
    """Miss / false-detection event counts at true emitter locations —
    the exact reference protocol (`joint_opt_ae.m:514-544`, thresholds at
    `:48-49`): for every band k and every emitter peak p at grid (x, y)
    [MATLAB indexes T(y, x, k), i.e. x = column]:

      ref = T_ref[k, y, x]
      ref > low_level  (a 'peak' event):  miss if T_hat[k,y,x] < 0.25*ref
      else             (a 'low' event):   false-detect if
                                          T_hat[k,y,x] > max(0.01, 1.75*ref)

    Returns (misses, total_peaks, misdetects, total_lows) scalar counts;
    the harness aggregates over examples and divides by (total+1) like the
    reference (`joint_opt_ae.m:549-554`).
    peaks_xy: [R, 2] (x, y) locations as produced by the simulator
    (physics/simulator.py sample_slf loc convention = generate_map.m
    emitter Xc/Yc).
    """
    px = jnp.clip(jnp.round(peaks_xy[:, 0]).astype(jnp.int32), 0,
                  T_ref.shape[2] - 1)
    py = jnp.clip(jnp.round(peaks_xy[:, 1]).astype(jnp.int32), 0,
                  T_ref.shape[1] - 1)
    ref_vals = T_ref[:, py, px]                       # [K, R]
    hat_vals = T_hat[:, py, px]
    is_peak = ref_vals > low_level
    miss = is_peak & (hat_vals < miss_threshold * ref_vals)
    misdetect = jnp.logical_and(
        ~is_peak,
        hat_vals > jnp.maximum(low_level, misdetect_threshold * ref_vals))
    return (jnp.sum(miss), jnp.sum(is_peak),
            jnp.sum(misdetect), jnp.sum(~is_peak))
