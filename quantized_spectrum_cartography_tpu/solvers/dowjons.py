"""DowJons-on-quantized: Euclidean surrogate on dequantized midpoints.

Re-design of `qmc/qmc_dowjons.ipynb` cell 1: observations are the bin
midpoints Obs = (W+U)/2 (quantization_model_log.py:43-51) and the cost is

    || mask * (log(T_hat(S,C) + offset) - Obs) ||^2
      + lambda_c ||C||_F + lambda_s ||Z||_F

with the same C/Z alternating Adam structure as the MLE solver but no
randomized search phase.  One `lax.scan`, vmappable over maps.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from quantized_spectrum_cartography_tpu.config import QuantizerConfig, SolverConfig
from quantized_spectrum_cartography_tpu.ops.quantizer import dequantize_midpoints
from quantized_spectrum_cartography_tpu.ops.lowrank import (
    get_tensor,
    project_nonneg,
    safe_fro,
)
from quantized_spectrum_cartography_tpu.ops.metrics import nmse
from quantized_spectrum_cartography_tpu.solvers.base import RecoveryResult, inner_steps


def recover_dowjons(
    key: jax.Array,
    Y: jnp.ndarray,
    mask: jnp.ndarray,
    gen_apply: Callable[[jnp.ndarray], jnp.ndarray],
    scfg: SolverConfig,
    qcfg: QuantizerConfig,
    Z_init: Optional[jnp.ndarray] = None,
    C_init: Optional[jnp.ndarray] = None,
    num_emitters: int = 2,
    T_true: Optional[jnp.ndarray] = None,
) -> RecoveryResult:
    K = Y.shape[0]
    R = num_emitters
    bb = jnp.asarray(qcfg.boundaries, jnp.float32)
    Obs = dequantize_midpoints(Y, bb)
    offset = qcfg.log_offset

    track_true = T_true is not None
    T_ref = T_true if track_true else jnp.zeros((K,) + Y.shape[1:], jnp.float32)

    if Z_init is None:
        key, kz = jax.random.split(key)
        Z_init = jax.random.normal(kz, (R, scfg.z_dim))
    if C_init is None:
        C_init = jnp.zeros((R, K))

    opt_c = optax.adam(scfg.lr_c)
    opt_z = optax.adam(scfg.lr_z)

    def data_cost(S, C):
        T_hat = jnp.log(get_tensor(S, C) + offset)
        return jnp.sum(jnp.square(mask * (T_hat - Obs)))

    def cost_c(C, S, Z):
        return (data_cost(S, C) + scfg.lambda_c * safe_fro(C)
                + scfg.lambda_s * safe_fro(Z))

    def cost_z(Z, C):
        return (data_cost(gen_apply(Z), C) + scfg.lambda_c * safe_fro(C)
                + scfg.lambda_s * safe_fro(Z))

    def iteration(carry, _):
        C, Z, cs, zs = carry
        S = gen_apply(Z)           # dowjons recomputes S before the C-step
        C, cs, _ = inner_steps(
            scfg.c_inner_iters, opt_c, lambda c: cost_c(c, S, Z), C, cs)
        C = project_nonneg(C)
        Z, zs, cost = inner_steps(
            scfg.s_inner_iters, opt_z, lambda z: cost_z(z, C), Z, zs)
        err = (nmse(get_tensor(gen_apply(Z), C), T_ref) if track_true
               else jnp.float32(0.0))
        return (C, Z, cs, zs), (cost, err)

    carry = (C_init, Z_init, opt_c.init(C_init), opt_z.init(Z_init))
    (C, Z, _, _), (costs, nmses) = jax.lax.scan(
        iteration, carry, None, length=scfg.max_iters)
    S = gen_apply(Z)
    return RecoveryResult(S=S, C=C, T_hat=get_tensor(S, C),
                          nmses=nmses, costs=costs, aux={"Z": Z})
