"""Sharded batched recovery: the scale-out path the reference never had.

Two mechanisms, both over the ('data', 'model') mesh of parallel/mesh.py:

1. `batched_recover_*` — jit with sharding annotations: the whole vmapped
   solver runs SPMD, XLA inserts any needed collectives.  Map-batch
   ('data') parallelism is communication-free; recoveries scale linearly.

2. `make_sharded_mle_step` — an explicit `shard_map` alternating-MLE step
   that also shards the frequency axis ('model'): per-shard likelihood
   gradients are computed locally and the S-factor gradient — the only
   cross-frequency quantity — is reduced with one `psum` over 'model',
   riding ICI.  This is the pattern for problems too large for one chip
   (many bands / finer grids).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from quantized_spectrum_cartography_tpu.config import QuantizerConfig, SolverConfig
from quantized_spectrum_cartography_tpu.ops.likelihood import (
    log_prob_probit_bounds,
)
from quantized_spectrum_cartography_tpu.ops.lowrank import project_nonneg
from quantized_spectrum_cartography_tpu.parallel.mesh import (
    batch_sharding,
    replicated,
)
from quantized_spectrum_cartography_tpu.solvers.lowrank_mle import (
    recover_lowrank_mle,
)

_HIGH = jax.lax.Precision.HIGHEST


def batched_recover_lowrank(
    mesh: Mesh,
    T_obs: jnp.ndarray,      # [B, K, I, J]
    S_init: jnp.ndarray,     # [B, R, I, J]
    C_init: jnp.ndarray,     # [B, R, K]
    cfg: SolverConfig,
    mean: float,
    std: float,
    T_true: Optional[jnp.ndarray] = None,
):
    """Data-parallel batched low-rank MLE: B independent recoveries sharded
    over the 'data' axis; zero inter-device communication."""
    solver = jax.vmap(
        functools.partial(recover_lowrank_mle, cfg=cfg, mean=mean, std=std))
    in_sh = (batch_sharding(mesh, 4), batch_sharding(mesh, 4),
             batch_sharding(mesh, 3))
    if T_true is not None:
        fn = jax.jit(
            lambda t, s, c, tt: jax.vmap(
                lambda a, b, d, e: recover_lowrank_mle(
                    a, b, d, cfg, mean, std, T_true=e))(t, s, c, tt),
            in_shardings=in_sh + (batch_sharding(mesh, 4),))
        return fn(T_obs, S_init, C_init, T_true)
    fn = jax.jit(
        lambda t, s, c: jax.vmap(
            lambda a, b, d: recover_lowrank_mle(a, b, d, cfg, mean, std)
        )(t, s, c),
        in_shardings=in_sh)
    return fn(T_obs, S_init, C_init)


def make_sharded_mle_step(
    mesh: Mesh,
    scfg: SolverConfig,
    qcfg: QuantizerConfig,
    lr: float = 0.001,
):
    """Explicit shard_map MLE gradient step over ('data', 'model').

    Arrays arrive sharded: W/U/mask [B, K, IJ] with B over 'data' and K
    over 'model'; factors S [B, R, IJ] (replicated over 'model') and
    C [B, R, K] (K-sharded).  The returned step function computes one
    projected gradient update of both factors:

      local:  X = C_loc^T S -> logP -> dX       (entrywise in K: no comm)
      dC_loc = dX S^T                            (local: C is K-sharded)
      dS     = psum_model(C_loc dX)              (the ONE collective)
    """
    sigma, offset = qcfg.noise_std, qcfg.log_offset

    def step(S, C, W, U):
        # S: [R, IJ] (replicated over model), C: [R, K_loc],
        # W/U: [K_loc, IJ] local frequency shard
        X = jnp.einsum("rk,rp->kp", C, S, precision=_HIGH)
        x = jnp.log(X + offset)
        logP = log_prob_probit_bounds(W, U, x, sigma)
        nll_loc = -jnp.sum(logP)
        dlogP_dx = jax.grad(
            lambda xx: jnp.sum(log_prob_probit_bounds(W, U, xx, sigma)))(x)
        dX = -dlogP_dx / (X + offset)
        dC = jnp.einsum("kp,rp->rk", dX, S, precision=_HIGH)          # local
        dS_partial = jnp.einsum("rk,kp->rp", C, dX, precision=_HIGH)
        dS = jax.lax.psum(dS_partial, "model")            # the one collective
        nll = jax.lax.psum(nll_loc, "model")
        S_new = S - lr * dS
        C_new = project_nonneg(C - lr * dC)
        return S_new, C_new, nll

    sharded = jax.shard_map(
        jax.vmap(step),
        mesh=mesh,
        in_specs=(P("data", None, None), P("data", None, "model"),
                  P("data", "model", None), P("data", "model", None)),
        out_specs=(P("data", None, None), P("data", None, "model"),
                   P("data",)),
    )
    return jax.jit(sharded)
