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


def peak_detection_stats(
    S_hat: jnp.ndarray, peaks_ij: jnp.ndarray, threshold_quantile: float = 0.99
):
    """Miss-detection statistic at true emitter locations.

    Reference protocol (`joint_opt_ae.m:514-544`): an emitter at (i,j) is
    'detected' if the recovered SLF value near the peak is above a high
    quantile of the map.  Returns boolean per-emitter detections.
    S_hat: [R, I, J]; peaks_ij: [R, 2] integer grid locations.
    """
    thr = jnp.quantile(S_hat.reshape(S_hat.shape[0], -1), threshold_quantile, axis=-1)
    vals = S_hat[jnp.arange(S_hat.shape[0]), peaks_ij[:, 0], peaks_ij[:, 1]]
    return vals >= thr
