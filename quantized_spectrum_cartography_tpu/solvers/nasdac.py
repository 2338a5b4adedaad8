"""Nasdac: SPA initialization + autoencoder completion.

Re-design of the harness's Nasdac method (`backup/algorithms/
joint_opt_ae.m:213-277`): SPA on the unfolded sampled tensor picks
near-pure frequency bands whose spatial columns seed per-emitter SLFs;
each (masked) SLF estimate is completed by the trained AE
(`py.nn_descent_ae.model_ae`), and the PSD factor is refit by NNLS on the
completed SLFs.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from quantized_spectrum_cartography_tpu.baselines.nnls import nnls_rows
from quantized_spectrum_cartography_tpu.baselines.spa import nmf_spa
from quantized_spectrum_cartography_tpu.ops.lowrank import get_tensor
from quantized_spectrum_cartography_tpu.solvers.base import RecoveryResult


def recover_nasdac(
    T_obs: jnp.ndarray,
    Om: jnp.ndarray,
    ae_complete: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    num_emitters: int = 2,
    nnls_iters: int = 200,
) -> RecoveryResult:
    """T_obs [K, I, J] sampled at per-location mask Om [I, J] (zeros
    elsewhere); ae_complete(mask, slf) -> completed slf [I, J]."""
    K, I, J = T_obs.shape
    R = num_emitters
    W = Om.astype(T_obs.dtype)

    # SPA on the sampled unfolding (observed spatial columns)
    C0, S_flat = nmf_spa((T_obs * W[None]).reshape(K, -1), R)
    S0 = S_flat.reshape(R, I, J)

    # AE completion of each masked SLF estimate
    S_hat = jnp.stack([ae_complete(W, S0[r]) for r in range(R)])

    # refit C by NNLS on the completed SLFs over observed entries
    Wf = W.reshape(1, -1)
    design = (S_hat.reshape(R, -1) * Wf).T                  # [IJ, R]
    C_hat = nnls_rows(design, (T_obs * W[None]).reshape(K, -1),
                      iters=nnls_iters).T                    # [R, K]

    T_hat = get_tensor(S_hat, C_hat)
    zero = jnp.zeros((1,), jnp.float32)
    return RecoveryResult(S=S_hat, C=C_hat, T_hat=T_hat,
                          nmses=zero, costs=zero,
                          aux={"S_spa": S0, "C_spa": C0})
