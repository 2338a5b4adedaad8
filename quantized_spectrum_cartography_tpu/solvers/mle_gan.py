"""Main quantized-recovery solver: probit MLE with a GAN deep prior.

TPU-native re-design of the reference's headline algorithm
(`qmc/qmc.ipynb` cell 1, "Main Algorithm — alternating optimization with
gradient descent"):

  repeat maxIter times:
    C-step:  Adam on C of  -sum(W * log P(Y | log(T_hat(S,C)+offset)))
             + lambda_c ||C||_F + lambda_s ||Z||_F,  then clamp C >= 0
    (at iteration z_search_at_iter: randomized Z re-init, 200 global +
     200 local candidate draws scored by the same likelihood)
    S-step:  S = G(Z); Adam on Z of the same cost

Key deviations (all TPU-motivated):
- the whole loop is two `lax.scan` phases around one fixed-shape vmapped
  candidate search (the reference's sequential 400-forward Python loop);
- bin boundaries are gathered once (Y is constant during the solve), so
  the hot path is reconstruction + fused log-likelihood only;
- the likelihood is the stable log-space probit (ops/likelihood.py), where
  the reference computes log(Phi-Phi) directly;
- the reference's local-search loop re-scores the *last global* candidate
  output (qmc.ipynb cell 1 second 200-loop uses temp_out from the previous
  loop — a bug); here each local candidate is scored on its own output.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from quantized_spectrum_cartography_tpu.config import QuantizerConfig, SolverConfig
from quantized_spectrum_cartography_tpu.ops.likelihood import (
    gather_bin_bounds,
    log_prob_probit_bounds,
    masked_nll,
)
from quantized_spectrum_cartography_tpu.ops.lowrank import (
    get_tensor,
    pad_spatial,
    project_nonneg,
    safe_fro,
)
from quantized_spectrum_cartography_tpu.ops.pallas import (
    fused_quantized_nll,
    fused_quantized_nll_coded,
    pack_bounds,
    pack_codes,
)
from quantized_spectrum_cartography_tpu.ops.metrics import nmse
from quantized_spectrum_cartography_tpu.solvers.base import RecoveryResult, inner_steps
from quantized_spectrum_cartography_tpu.solvers.priors import randomized_search


class GanSolverState(NamedTuple):
    """Scan carry of an MLE-GAN run — plain array pytree for Orbax
    snapshot/resume of long sweeps (SURVEY.md section 5.4).  `iteration`
    is absolute, so the one-time randomized z-search (fired at absolute
    iteration z_search_at_iter) is not re-run by a resumed segment that
    starts past it."""

    C: jnp.ndarray
    Z: jnp.ndarray
    opt_c: tuple
    opt_z: tuple
    iteration: jnp.ndarray          # int32 scalar


def recover_mle_gan(
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
    use_fused: bool = True,
    nll_mode: str = "auto",
    obs_encoding: str = "bounds",
    state: Optional[GanSolverState] = None,
) -> RecoveryResult:
    """Recover (S = G(Z), C) from ordinal observations Y [K, I, J].

    use_fused=True routes the likelihood through the fused analytic-VJP
    kernel (ops/pallas/fused_likelihood.py); False keeps the generic
    gather-based path.  nll_mode picks the fused backend: 'auto' = Pallas
    on TPU / jnp elsewhere, 'xla' = the same math + analytic backward
    compiled by XLA (skips the Mosaic kernel compile), 'pallas' = force.

    `state` resumes from a previous result's aux["state"]: N then M
    resumed iterations equal N+M straight ones (the z-search placement is
    honored in absolute-iteration terms; tests/test_solver_resume.py).
    """
    K = Y.shape[0]
    bb = jnp.asarray(qcfg.boundaries, jnp.float32)
    offset, std = qcfg.log_offset, qcfg.noise_std
    R = num_emitters
    if use_fused and obs_encoding == "codes":
        Yc = pack_codes(Y, len(qcfg.boundaries) - 1, mask)
        bbt = tuple(float(v) for v in qcfg.boundaries)
    elif use_fused:
        Wp, Up = pack_bounds(Y, bb, mask)
    else:
        Wb, Ub = gather_bin_bounds(Y, bb)

    track_true = T_true is not None
    T_ref = T_true if track_true else jnp.zeros((K,) + Y.shape[1:], jnp.float32)

    if Z_init is None:
        key, kz = jax.random.split(key)
        Z_init = jax.random.normal(kz, (R, scfg.z_dim))
    if C_init is None:
        C_init = jnp.zeros((R, K))

    opt_c = optax.adam(scfg.lr_c)
    opt_z = optax.adam(scfg.lr_z)

    if use_fused and obs_encoding == "codes":
        def nll(S, C):
            S_flat = pad_spatial(S.reshape(R, -1))
            return fused_quantized_nll_coded(S_flat, C.T, Yc, bbt, std,
                                             offset, False, False, None,
                                             nll_mode)
    elif use_fused:
        def nll(S, C):
            S_flat = pad_spatial(S.reshape(R, -1))
            return fused_quantized_nll(S_flat, C.T, Wp, Up, std, offset,
                                       False, False, None, nll_mode)
    else:
        def nll(S, C):
            x = jnp.log(get_tensor(S, C) + offset)
            return masked_nll(log_prob_probit_bounds(Wb, Ub, x, std), mask)

    def cost_c(C, S, Z):
        return (nll(S, C) + scfg.lambda_c * safe_fro(C)
                + scfg.lambda_s * safe_fro(Z))

    def cost_z(Z, C):
        return (nll(gen_apply(Z), C) + scfg.lambda_c * safe_fro(C)
                + scfg.lambda_s * safe_fro(Z))

    def iteration(carry, _):
        C, Z, S, cs, zs = carry
        # C-step on detached S (reference: Sc = S.detach())
        C, cs, _ = inner_steps(
            scfg.c_inner_iters, opt_c, lambda c: cost_c(c, S, Z), C, cs)
        C = project_nonneg(C)
        # S-step through the frozen generator
        Z, zs, cost = inner_steps(
            scfg.s_inner_iters, opt_z, lambda z: cost_z(z, C), Z, zs)
        S = gen_apply(Z)
        err = (nmse(get_tensor(S, C), T_ref) if track_true
               else jnp.float32(0.0))
        return (C, Z, S, cs, zs), (cost, err)

    if state is not None:
        start = int(state.iteration)
        carry = (state.C, state.Z, gen_apply(state.Z), state.opt_c,
                 state.opt_z)
    else:
        start = 0
        S0 = gen_apply(Z_init)
        carry = (C_init, Z_init, S0, opt_c.init(C_init),
                 opt_z.init(Z_init))

    # z-search fires at ABSOLUTE iteration z_search_at_iter; a resumed
    # segment that starts past it must not re-run it
    t_abs = max(scfg.z_search_at_iter, 0)
    t = min(max(t_abs - start, 0), scfg.max_iters)
    do_search = ((scfg.z_search_global + scfg.z_search_local) > 0
                 and t_abs >= start and t < scfg.max_iters)

    # phase A: iterations [0, t)
    carry, traj_a = jax.lax.scan(iteration, carry, None, length=t)

    if do_search:
        # special iteration t: C-step, randomized Z re-init, S-step
        C, Z, S, cs, zs = carry
        C, cs, _ = inner_steps(
            scfg.c_inner_iters, opt_c, lambda c: cost_c(c, S, Z), C, cs)
        C = project_nonneg(C)
        key, ks = jax.random.split(key)
        Z = randomized_search(
            ks, gen_apply, lambda Sc: nll(Sc, C), Z,
            scfg.z_search_global, scfg.z_search_local,
            scfg.z_search_local_scale)
        Z, zs, cost = inner_steps(
            scfg.s_inner_iters, opt_z, lambda z: cost_z(z, C), Z, zs)
        S = gen_apply(Z)
        err = (nmse(get_tensor(S, C), T_ref) if track_true
               else jnp.float32(0.0))
        carry = (C, Z, S, cs, zs)
        traj_t = (cost[None], err[None])
        remaining = scfg.max_iters - t - 1
    else:
        traj_t = (jnp.zeros((0,)), jnp.zeros((0,)))
        remaining = scfg.max_iters - t

    # phase B: the rest
    carry, traj_b = jax.lax.scan(iteration, carry, None, length=remaining)

    C, Z, S, cs, zs = carry
    costs = jnp.concatenate([traj_a[0], traj_t[0], traj_b[0]])
    nmses = jnp.concatenate([traj_a[1], traj_t[1], traj_b[1]])
    final = GanSolverState(C=C, Z=Z, opt_c=cs, opt_z=zs,
                           iteration=jnp.int32(start + scfg.max_iters))
    return RecoveryResult(S=S, C=C, T_hat=get_tensor(S, C),
                          nmses=nmses, costs=costs,
                          aux={"Z": Z, "state": final})
