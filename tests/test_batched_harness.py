"""BatchedHarness: vmapped condition runner semantics + Hungarian matching.

The batched runner must reproduce the reference accumulation rules
(`joint_opt_ae.m:496-501` validity, `:514-554` detection, `:1014-1016`
NAE) while keeping compiled programs shape-stable across the shadow / Xc /
SNR axes and — for every method that ignores sample_idx — across the
fraction axis.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from quantized_spectrum_cartography_tpu.baselines import (
    BatchedHarness,
    Condition,
    best_permutation,
    condition_grid,
)
from quantized_spectrum_cartography_tpu.config import PhysicsConfig

PHYS = PhysicsConfig()


def test_best_permutation_is_globally_optimal():
    """Hungarian assignment must maximize TOTAL correlation; greedy
    matching (the round-2 implementation) fails on crossed factors."""
    rng = np.random.default_rng(3)
    for R in (2, 4, 6):
        S_hat = jnp.asarray(rng.random((R, 9)) + 0.01)
        S_true = jnp.asarray(rng.random((R, 9)) + 0.01)
        A = np.asarray(S_hat) / np.linalg.norm(S_hat, axis=1, keepdims=True)
        B = np.asarray(S_true) / np.linalg.norm(S_true, axis=1,
                                                keepdims=True)
        corr = A @ B.T
        best_total, best_perm = -np.inf, None
        for p in itertools.permutations(range(R)):
            tot = sum(corr[p[j], j] for j in range(R))
            if tot > best_total:
                best_total, best_perm = tot, p
        got = np.asarray(best_permutation(S_hat, S_true))
        got_total = sum(corr[got[j], j] for j in range(R))
        assert np.isclose(got_total, best_total), (got, best_perm)


def test_best_permutation_greedy_trap():
    """Explicit crossed case: greedy takes the 0.99 match first and is
    forced into a 0.1 second match; the optimum is the 0.9 + 0.95 cross."""
    e = np.eye(3)
    # true0 = e0, true1 = e1
    S_true = jnp.asarray([e[0], e[1]])
    # hat0 correlates 0.99 with true0 and 0.9 with true1;
    # hat1 correlates 0.95 with true0 and 0.1 with true1
    h0 = 0.99 * e[0] + 0.9 * e[1] + 0.2 * e[2]
    h1 = 0.95 * e[0] + 0.1 * e[1] + 0.2 * e[2]
    S_hat = jnp.asarray([h0, h1])
    A = np.asarray(S_hat) / np.linalg.norm(S_hat, axis=1, keepdims=True)
    corr = A @ np.asarray(S_true).T
    perm = np.asarray(best_permutation(S_hat, S_true))
    tot = corr[perm[0], 0] + corr[perm[1], 1]
    greedy_tot = corr[0, 0] + corr[1, 1]      # greedy picks hat0->true0
    alt = corr[1, 0] + corr[0, 1]
    assert tot == max(greedy_tot, alt)


def _oracle(key, hp):
    return {"T_hat": hp.T_true, "S_hat": hp.S_true, "C_hat": hp.C_true}


def _zero(key, hp):
    return {"T_hat": jnp.zeros_like(hp.T_true)}


def test_batched_oracle_and_zero_semantics():
    h = BatchedHarness({"oracle": _oracle, "zero": _zero}, PHYS)
    out = h.run(condition_grid(), num_examples=4, seed=1)
    (label, per_method), = out.items()
    o = per_method["oracle"]
    assert o["sre"] < 1e-9
    assert o["nae_s"] < 1e-6 and o["nae_c"] < 1e-6
    assert o["miss_count"] == 0 and o["false_count"] == 0
    assert o["valid"] == 4 and len(o["sre_all"]) == 4
    z = per_method["zero"]
    assert abs(z["sre"] - 1.0) < 1e-6
    # zero recovery misses every peak event; (total+1) denominator
    assert z["miss_count"] == z["peak_count"] > 0
    assert z["miss_prob"] == z["peak_count"] / (z["peak_count"] + 1)
    assert z["false_count"] == 0


def test_batched_validity_cap():
    """Examples over the cap are excluded from every accumulator
    (joint_opt_ae.m:496-501 count_valid semantics)."""

    def flaky(key, hp):
        bad = jax.random.bernoulli(key, 0.5)
        scale = jnp.where(bad, 10.0, 1.0)
        return {"T_hat": hp.T_true * scale, "S_hat": hp.S_true,
                "C_hat": hp.C_true}

    h = BatchedHarness({"flaky": flaky}, PHYS,
                       validity_caps={"flaky": 3.0})
    out = h.run(condition_grid(), num_examples=8, seed=2)
    (_, per_method), = out.items()
    st = per_method["flaky"]
    sre_all = np.asarray(st["sre_all"])
    n_valid = int((sre_all < 3.0).sum())
    assert 0 < n_valid < 8          # both branches hit at this seed count
    assert st["valid"] == n_valid
    assert np.isclose(st["sre"], sre_all[sre_all < 3.0].mean())


def test_batched_program_reuse_across_axes():
    """One generator program serves the shadow/Xc/SNR axes; a method that
    ignores sample_idx traces exactly once across the fraction axis."""
    traces = {"n": 0}

    def counting_zero(key, hp):
        traces["n"] += 1
        return {"T_hat": jnp.zeros_like(hp.T_true)}

    h = BatchedHarness({"zero": counting_zero}, PHYS)
    conds = (condition_grid("shadow_sigma", (4, 6))
             + condition_grid("xc", (30, 70))
             + condition_grid("snr", (10,)))
    h.run(conds, num_examples=2, seed=0)
    assert len(h._gen_cache) == 1          # one (R, N) program for all five
    assert traces["n"] == 1                # one method trace

    h.run(condition_grid("fraction", (0.01, 0.2)), num_examples=2, seed=0)
    assert traces["n"] == 1                # sample_idx stripped: still one
    # the observed count is traced: the fraction axis reuses the program too
    assert len(h._gen_cache) == 1

    h.run(condition_grid("num_emitters", (3,)), num_examples=2, seed=0)
    assert len(h._gen_cache) == 2          # only R forces a new program


def test_batched_matches_sequential_rules_on_shared_problem():
    """Feed the SAME generated batch through the batched metrics path and
    a hand computation: miss/false counts agree with detection_counts."""
    from quantized_spectrum_cartography_tpu.ops.metrics import (
        detection_counts, sre)

    h = BatchedHarness({"zero": _zero}, PHYS)
    cond = Condition()
    genf = h._problem_gen(cond.num_emitters)
    from quantized_spectrum_cartography_tpu.physics.shadowing import (
        correlation_cholesky)
    chol = jnp.asarray(correlation_cholesky(51, cond.xc))
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    arrs = genf(keys, chol, jnp.float32(cond.shadow_sigma), jnp.float32(0.0),
                jnp.int32(round(cond.fraction * 51 * 51)))
    assert int(np.asarray(arrs["Om"]).sum()) == \
        3 * int(round(cond.fraction * 51 * 51))
    # noiseless: T_noisy == T_true exactly
    assert np.allclose(np.asarray(arrs["T_noisy"]),
                       np.asarray(arrs["T_true"]))
    miss = peaks = 0
    for b in range(3):
        m, p, _, _ = detection_counts(jnp.zeros_like(arrs["T_true"][b]),
                                      arrs["T_noisy"][b], arrs["peaks"][b])
        miss += int(m)
        peaks += int(p)
    out = h.run((cond,), num_examples=3, seed=0)
    st = out[cond.label()]["zero"]
    assert st["miss_count"] == miss and st["peak_count"] == peaks
