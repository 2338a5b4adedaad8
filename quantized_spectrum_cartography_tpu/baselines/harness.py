"""Evaluation harness: the SRE / NAE / miss-detection sweep protocol.

Re-design of the MATLAB comparison harness
(`backup/algorithms/joint_opt_ae.m`): for each condition (sampling
fraction rho / R / shadow sigma / Xc / snr) and each Monte-Carlo example,
generate a map, sample observations, run each registered method, and
accumulate SRE (:1020), NAE_S / NAE_C (:1024-1035) with factor-permutation
fixing (cpderr-style greedy matching, :213-246), and miss/false-detection
probability at the true emitter peaks (:514-544).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from quantized_spectrum_cartography_tpu.config import PhysicsConfig
from quantized_spectrum_cartography_tpu.ops.metrics import nae, sre
from quantized_spectrum_cartography_tpu.physics import generate_onebit_problem


def best_permutation(S_hat: jnp.ndarray, S_true: jnp.ndarray) -> jnp.ndarray:
    """Greedy factor matching (the role of tensorlab `cpderr` permutation
    fixing at joint_opt_ae.m:213-246): order S_hat rows to best match
    S_true rows by normalized correlation.  R is small (2-5) so the greedy
    assignment is computed hostside in numpy."""
    A = np.asarray(S_hat).reshape(S_hat.shape[0], -1)
    B = np.asarray(S_true).reshape(S_true.shape[0], -1)
    A = A / np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-12)
    B = B / np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-12)
    corr = A @ B.T                               # [R_hat, R_true]
    perm = -np.ones(B.shape[0], dtype=np.int64)
    used = set()
    for _ in range(B.shape[0]):
        i, j = np.unravel_index(
            np.argmax(np.where(
                np.isin(np.arange(corr.shape[0]), list(used))[:, None],
                -np.inf, corr)), corr.shape)
        perm[j] = i
        used.add(int(i))
        corr[:, j] = -np.inf
    return jnp.asarray(perm)


@dataclasses.dataclass
class MethodResult:
    sre_map: float
    nae_s: List[float]
    nae_c: List[float]
    detected: List[bool]


def evaluate_method(
    T_hat: jnp.ndarray,
    T_true: jnp.ndarray,
    S_hat: Optional[jnp.ndarray] = None,
    C_hat: Optional[jnp.ndarray] = None,
    S_true: Optional[jnp.ndarray] = None,
    C_true: Optional[jnp.ndarray] = None,
    peaks: Optional[jnp.ndarray] = None,
    detection_quantile: float = 0.98,
) -> MethodResult:
    """Metrics for one recovery (joint_opt_ae.m:1020-1035, 514-544)."""
    sre_map = float(sre(T_hat, T_true))
    nae_s, nae_c, detected = [], [], []
    if S_hat is not None and S_true is not None:
        perm = best_permutation(S_hat, S_true)
        S_hat = S_hat[perm]
        if C_hat is not None:
            C_hat = C_hat[perm]
        for r in range(S_true.shape[0]):
            nae_s.append(float(nae(S_hat[r], S_true[r])))
            if C_hat is not None and C_true is not None:
                nae_c.append(float(nae(C_hat[r], C_true[r])))
        if peaks is not None:
            for r in range(S_true.shape[0]):
                thr = jnp.quantile(S_hat[r].reshape(-1), detection_quantile)
                pi = jnp.clip(peaks[r].astype(jnp.int32), 0,
                              S_hat.shape[-1] - 1)
                # 3x3 neighborhood max around the true peak
                i0 = jnp.clip(pi[1], 1, S_hat.shape[-2] - 2)
                j0 = jnp.clip(pi[0], 1, S_hat.shape[-1] - 2)
                patch = jax.lax.dynamic_slice(
                    S_hat[r], (i0 - 1, j0 - 1), (3, 3))
                detected.append(bool(jnp.max(patch) >= thr))
    return MethodResult(sre_map=sre_map, nae_s=nae_s, nae_c=nae_c,
                        detected=detected)


RecoverFn = Callable[[jax.Array, "object", float], Dict[str, jnp.ndarray]]
# signature: (key, Problem, sample_fraction) -> {"T_hat":..., optional
# "S_hat", "C_hat"}


def run_sweep(
    methods: Dict[str, RecoverFn],
    fractions: Sequence[float] = (0.05, 0.1),
    num_examples: int = 5,
    physics: PhysicsConfig = PhysicsConfig(),
    seed: int = 0,
) -> Dict[str, Dict[float, Dict[str, float]]]:
    """Monte-Carlo sweep like joint_opt_ae.m:82-117.

    Returns results[method][fraction] = {sre, nae_s, nae_c, miss_prob}.
    """
    out: Dict[str, Dict[float, Dict[str, float]]] = {
        m: {} for m in methods}
    for f in fractions:
        acc = {m: {"sre": [], "nae_s": [], "nae_c": [], "miss": []}
               for m in methods}
        for ex in range(num_examples):
            key = jax.random.PRNGKey(seed * 10_000 + ex)
            kgen, krun = jax.random.split(key)
            prob = generate_onebit_problem(kgen, physics, sample_fraction=f)
            for name, fn in methods.items():
                res = fn(jax.random.fold_in(krun, hash(name) % (2**31)),
                         prob, f)
                mr = evaluate_method(
                    res["T_hat"], prob.T_true,
                    S_hat=res.get("S_hat"), C_hat=res.get("C_hat"),
                    S_true=prob.S_true, C_true=prob.C_true,
                    peaks=res.get("peaks"))
                acc[name]["sre"].append(mr.sre_map)
                acc[name]["nae_s"].extend(mr.nae_s)
                acc[name]["nae_c"].extend(mr.nae_c)
                if mr.detected:
                    acc[name]["miss"].extend(
                        [0.0 if d else 1.0 for d in mr.detected])
        for name in methods:
            out[name][f] = {
                k: (float(np.mean(v)) if v else float("nan"))
                for k, v in acc[name].items()}
    return out
