"""Plain low-rank 1-bit MLE recovery (no deep prior).

Re-design of `backup/notebooks/onebit_lowrank.ipynb` cells 1 and 16:
S, C are free factors optimized by alternating (or joint) Adam on the
probit/logistic BCE likelihood, with periodic projection onto the feasible
set (SVD rank-truncation of each SLF, nonnegativity clamps).  The whole
run is one `lax.scan`, so it jit-compiles to a single XLA program and is
vmappable over a batch of maps.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from quantized_spectrum_cartography_tpu.config import SolverConfig
from quantized_spectrum_cartography_tpu.ops.likelihood import (
    _SIGMA_EFF,
    neg_likelihood_1bit,
    onebit_nll_factors,
    pack_sign_mask,
)
from quantized_spectrum_cartography_tpu.ops.lowrank import (
    get_tensor,
    pad_spatial,
    project_nonneg,
    project_rank,
    project_rank_subspace,
    safe_fro,
)
from quantized_spectrum_cartography_tpu.ops.pallas import (
    fused_onebit_nll,
    fused_quantized_nll,
    fused_quantized_nll_coded,
    onebit_bounds,
    pack_bounds_1bit,
    pack_codes_1bit,
)
from quantized_spectrum_cartography_tpu.ops.metrics import nmse
from quantized_spectrum_cartography_tpu.solvers.base import (
    RecoveryResult,
    inner_steps,
)


class SolverState(NamedTuple):
    """The full scan carry of a low-rank MLE run — a plain pytree of
    arrays, so it Orbax-round-trips (`training/checkpoints.py`) for
    mid-run snapshot/resume of long sweeps (SURVEY.md section 5.4; the
    reference has no mid-run resume at all).  `iteration` is the absolute
    outer-iteration counter, so projection cadence
    ((i+1) % projection_interval) continues exactly where it left off."""

    S: jnp.ndarray
    C: jnp.ndarray
    opt_s: tuple
    opt_c: tuple
    iteration: jnp.ndarray          # int32 scalar


def recover_lowrank_mle(
    T_obs: jnp.ndarray,
    S_init: jnp.ndarray,
    C_init: jnp.ndarray,
    cfg: SolverConfig,
    mean: float,
    std: float,
    probit: bool = True,
    mask: Optional[jnp.ndarray] = None,
    T_true: Optional[jnp.ndarray] = None,
    l1: float = 0.0,
    l2: float = 0.01,
    joint: bool = False,
    use_fused: bool = True,
    nll_mode: str = "auto",
    obs_encoding: str = "auto",
    state: Optional[SolverState] = None,
) -> RecoveryResult:
    """Recover (S, C) from 1-bit observations T_obs in {0, 1}.

    joint=False: innerIter S-steps then innerIter C-steps per outer iter
    (onebit_lowrank.ipynb cell 1); joint=True: simultaneous single step on
    both factors with projection every iteration (cell 16).
    T_true (optional) enables NMSE tracking, like the notebook's `nmses`.
    use_fused routes the probit BCE through the fused Pallas kernel as the
    2-bin linear-link ordinal case (sigmoid link always takes the generic
    path).

    `state` resumes a previous run from its snapshot: the result's
    aux["state"] (optionally Orbax-saved/restored in between) continues
    the exact trajectory — N iters then M resumed iters equals N+M
    straight iters bitwise (tests/test_solver_resume.py).
    """
    track_true = T_true is not None
    T_ref = T_true if track_true else jnp.zeros_like(T_obs)

    opt_s = optax.adam(cfg.lr_s)
    opt_c = optax.adam(cfg.lr_s if joint else cfg.lr_c)

    if use_fused and probit:
        R = S_init.shape[0]
        count = (jnp.sum(mask) if mask is not None
                 else jnp.float32(T_obs.size))
        if obs_encoding == "auto":
            # specialized 2-bin kernel: int8 codes + logPhi(sign*x) — half
            # the in-kernel transcendental work of the generic ordinal
            # kernel and 1/8 the observation traffic
            Yc = pack_codes_1bit(T_obs, mask)

            def cost_fn(S, C):
                S_flat = pad_spatial(S.reshape(R, -1))
                nll = fused_onebit_nll(
                    S_flat, C.T, Yc, float(mean), std, False, nll_mode)
                return nll / count + l1 * safe_fro(S) + l2 * safe_fro(C)
        elif obs_encoding == "codes":
            # int8 codes: 1/8 the observation memory/traffic; ~4% slower
            # steady-state on v5e at bench shapes (the in-kernel decode is
            # VPU-bound) — pick for memory-constrained / very large B
            Yc = pack_codes_1bit(T_obs, mask)
            bbt = onebit_bounds(mean)

            def cost_fn(S, C):
                S_flat = pad_spatial(S.reshape(R, -1))
                nll = fused_quantized_nll_coded(
                    S_flat, C.T, Yc, bbt, std, 0.0, False, True, None,
                    nll_mode)
                return nll / count + l1 * safe_fro(S) + l2 * safe_fro(C)
        else:
            Wp, Up = pack_bounds_1bit(T_obs, mean, mask)

            def cost_fn(S, C):
                S_flat = pad_spatial(S.reshape(R, -1))
                nll = fused_quantized_nll(
                    S_flat, C.T, Wp, Up, std, 0.0, False, True, None,
                    nll_mode)
                return nll / count + l1 * safe_fro(S) + l2 * safe_fro(C)
    elif probit:
        # XLA fast path: analytic custom-VJP NLL over the factors (no
        # autodiff residuals; int8 sign-mask).  Same value/gradient as the
        # generic path below (tests/test_likelihood.py).
        sm = pack_sign_mask(T_obs, mask)
        inv_s = jnp.float32(1.0 / (std * _SIGMA_EFF))
        inv_count = 1.0 / (jnp.maximum(jnp.sum(mask), 1.0) if mask is not None
                           else jnp.float32(T_obs.size))

        def cost_fn(S, C):
            nll = onebit_nll_factors(
                S if S.ndim == 3 else S[:, 0],
                C, sm, jnp.float32(mean), inv_s, inv_count)
            return nll + l1 * safe_fro(S) + l2 * safe_fro(C)
    else:
        def cost_fn(S, C):
            T_hat = get_tensor(S, C)
            return (
                neg_likelihood_1bit(T_hat, T_obs, mean, std, probit,
                                    mask=mask)
                + l1 * safe_fro(S)
                + l2 * safe_fro(C)
            )

    def project(S, C):
        if cfg.projection_method == "subspace":
            S = project_rank_subspace(S, cfg.rank_truncation)
        else:
            S = project_rank(S, cfg.rank_truncation)
        C = project_nonneg(C)
        if cfg.nonneg_slf:
            S = project_nonneg(S)
        return S, C

    def outer_step(carry, i):
        S, C, ss, cs = carry
        if joint:
            cost, (gS, gC) = jax.value_and_grad(cost_fn, argnums=(0, 1))(S, C)
            uS, ss = opt_s.update(gS, ss, S)
            uC, cs = opt_c.update(gC, cs, C)
            S = optax.apply_updates(S, uS)
            C = optax.apply_updates(C, uC)
            S, C = project(S, C)
        else:
            S, ss, _ = inner_steps(
                cfg.s_inner_iters, opt_s, lambda s: cost_fn(s, C), S, ss)
            C, cs, cost = inner_steps(
                cfg.c_inner_iters, opt_c, lambda c: cost_fn(S, c), C, cs)
            S, C = jax.lax.cond(
                (i + 1) % cfg.projection_interval == 0,
                lambda sc: project(*sc),
                lambda sc: sc,
                (S, C),
            )
        err = nmse(get_tensor(S, C), T_ref) if track_true else jnp.float32(0.0)
        return (S, C, ss, cs), (cost, err)

    if state is not None:
        init = (state.S, state.C, state.opt_s, state.opt_c)
        start = jnp.asarray(state.iteration, jnp.int32)
    else:
        init = (
            S_init,
            C_init,
            opt_s.init(S_init),
            opt_c.init(C_init),
        )
        start = jnp.int32(0)
    (S, C, ss, cs), (costs, nmses) = jax.lax.scan(
        outer_step, init, start + jnp.arange(cfg.max_iters))
    final = SolverState(S=S, C=C, opt_s=ss, opt_c=cs,
                        iteration=start + cfg.max_iters)
    return RecoveryResult(
        S=S, C=C, T_hat=get_tensor(S, C), nmses=nmses, costs=costs,
        aux={"state": final})
