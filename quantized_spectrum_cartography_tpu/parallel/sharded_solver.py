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

import optax

from quantized_spectrum_cartography_tpu.config import QuantizerConfig, SolverConfig
from quantized_spectrum_cartography_tpu.ops.likelihood import (
    log_prob_probit_bounds,
)
from quantized_spectrum_cartography_tpu.ops.lowrank import (
    project_nonneg,
    project_rank_subspace,
    safe_fro,
)
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


def recover_lowrank_mle_ksharded(
    mesh: Mesh,
    W: jnp.ndarray,          # [B, K, IJ] lower log-bin bounds (gathered)
    U: jnp.ndarray,          # [B, K, IJ] upper bounds; W=U=+inf sentinel ok
    S_init: jnp.ndarray,     # [B, R, IJ]
    C_init: jnp.ndarray,     # [B, R, K]
    scfg: SolverConfig,
    qcfg: QuantizerConfig,
    l2: float = 0.01,
):
    """Full K-sharded ordinal-MLE recovery: the model-parallel path for
    problems too large for one chip (many bands / finer grids).

    The whole Adam + lax.scan solver runs inside one `shard_map` over the
    ('data','model') mesh: observations and the C factor are sharded over
    the frequency axis, S is replicated over 'model', and each joint
    gradient step costs exactly ONE psum (the S-factor gradient — the only
    cross-frequency quantity; the likelihood is entrywise in K).  Adam
    states follow their factors (S-state replicated — the psum makes dS
    identical on every shard, so the updates stay bitwise in lockstep;
    C-state stays local).  Projection (rank truncation of S, nonneg clamp
    of C) happens every scfg.projection_interval iterations like the
    unsharded solver.

    Returns (S [B,R,IJ], C [B,R,K], costs [B, iters]).  Matches
    `recover_lowrank_mle`-style joint mode on the same bounds to f32
    tolerance at any ('data','model') mesh shape
    (tests/test_parallel.py::test_ksharded_full_solver_matches_unsharded).
    """
    sigma, offset = qcfg.noise_std, qcfg.log_offset
    opt_s = optax.adam(scfg.lr_s)
    opt_c = optax.adam(scfg.lr_s)
    IJ = S_init.shape[2]
    I_grid = int(round(IJ ** 0.5))
    do_rank_proj = I_grid * I_grid == IJ        # square spatial grid only

    def solve_one(S0, C0, Wl, Ul):
        # S0 [R, IJ] (model-replicated), C0 [R, K_loc], Wl/Ul [K_loc, IJ]
        def local_grads(S, C):
            # hand-split VJP so the ONE psum (dS) is explicit and the nll
            # reduction stays local
            X = jnp.einsum("rk,rp->kp", C, S, precision=_HIGH)
            # clamp the log-link argument: an Adam step between nonneg
            # projections can push X + offset below zero, which would NaN
            # the whole trajectory (the reference never sees this because
            # its S comes out of a sigmoid generator)
            Xo = jnp.maximum(X + offset, jnp.float32(1e-20))
            x = jnp.log(Xo)
            nll_loc, pull = jax.vjp(
                lambda xx: -jnp.sum(log_prob_probit_bounds(Wl, Ul, xx,
                                                           sigma)), x)
            dx = pull(jnp.ones_like(nll_loc))[0]   # cotangent keeps the
            # shard_map varying-axes type of the local output
            # where the clamp is active the clamped forward is constant in
            # X, so its true gradient is 0 — dividing by the 1e-20 floor
            # instead would blow up Adam's second moment to inf and freeze
            # those coordinates for the rest of the solve
            dX = jnp.where(X + offset > 1e-20, dx / Xo, 0.0)
            dC = jnp.einsum("kp,rp->rk", dX, S, precision=_HIGH)
            dS_partial = jnp.einsum("rk,kp->rp", C, dX, precision=_HIGH)
            dS = jax.lax.psum(dS_partial, "model")        # the one collective
            nll = jax.lax.psum(nll_loc, "model")
            # regularizer gradients (closed form)
            c_sq = jax.lax.psum(jnp.sum(jnp.square(C)), "model")
            c_fro = jnp.sqrt(c_sq + 1e-12)
            s_fro = safe_fro(S)
            dC = dC + l2 * C / c_fro
            dS = dS + l2 * S / jnp.maximum(s_fro, 1e-12)
            cost = nll + l2 * c_fro + l2 * s_fro
            return cost, dS, dC

        def outer(carry, i):
            S, C, ss, cs = carry
            cost, gS, gC = local_grads(S, C)
            uS, ss = opt_s.update(gS, ss, S)
            uC, cs = opt_c.update(gC, cs, C)
            S = optax.apply_updates(S, uS)
            C = optax.apply_updates(C, uC)

            def proj(sc):
                s, c = sc
                if do_rank_proj:
                    # S is model-replicated: the projection runs
                    # identically on every shard, no communication
                    s = project_rank_subspace(
                        s.reshape(s.shape[0], I_grid, I_grid),
                        scfg.rank_truncation).reshape(s.shape)
                return s, project_nonneg(c)

            S, C = jax.lax.cond(
                (i + 1) % scfg.projection_interval == 0,
                proj, lambda sc: sc, (S, C))
            return (S, C, ss, cs), cost

        init = (S0, C0, opt_s.init(S0), opt_c.init(C0))
        (S, C, _, _), costs = jax.lax.scan(
            outer, init, jnp.arange(scfg.max_iters))
        return S, C, costs

    sharded = jax.shard_map(
        jax.vmap(solve_one),
        mesh=mesh,
        in_specs=(P("data", None, None), P("data", None, "model"),
                  P("data", "model", None), P("data", "model", None)),
        out_specs=(P("data", None, None), P("data", None, "model"),
                   P("data", None)),
    )
    return jax.jit(sharded)(S_init, C_init, W, U)
