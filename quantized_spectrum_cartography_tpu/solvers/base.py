"""Shared solver scaffolding: result container + alternating-Adam helpers.

All solvers are pure functions  recover(obs, init, cfg) -> Result  whose
iteration loop is a `jax.lax.scan` with optax Adam states carried in the
scan carry — the TPU-idiomatic replacement for the reference's Python
`for i in range(maxIter)` notebook loops (`qmc/qmc.ipynb` cell 1,
`backup/notebooks/onebit_lowrank.ipynb` cell 1).  Every solver is
vmappable over a leading batch-of-maps axis.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RecoveryResult:
    """Factors + diagnostics from a recovery run.

    S: [R, I, J] spatial loss fields; C: [R, K] PSDs; T_hat: [K, I, J];
    nmses/costs: per-iteration trajectories (the reference tracks the same
    two arrays, qmc.ipynb cell 1 `nmses`/`costs`).
    """

    S: jnp.ndarray
    C: jnp.ndarray
    T_hat: jnp.ndarray
    nmses: jnp.ndarray
    costs: jnp.ndarray
    aux: Optional[Dict[str, Any]] = None


def adam_update(
    optimizer: optax.GradientTransformation,
    loss_fn: Callable[[Any], jnp.ndarray],
    param: Any,
    opt_state: Any,
):
    """One Adam step on a single factor (value_and_grad + update)."""
    cost, grad = jax.value_and_grad(loss_fn)(param)
    updates, opt_state = optimizer.update(grad, opt_state, param)
    return optax.apply_updates(param, updates), opt_state, cost


def inner_steps(
    n: int,
    optimizer: optax.GradientTransformation,
    loss_fn: Callable[[Any], jnp.ndarray],
    param: Any,
    opt_state: Any,
):
    """`n` Adam steps on one factor (the reference's cinnerIter/sinnerIter
    inner loops) as a fori_loop; returns (param, opt_state, last_cost)."""

    def body(_, carry):
        p, s, _ = carry
        p, s, c = adam_update(optimizer, loss_fn, p, s)
        return p, s, c

    return jax.lax.fori_loop(0, n, body, (param, opt_state, jnp.float32(0.0)))
