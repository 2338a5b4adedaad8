"""Full joint_opt_ae.m protocol: reference detection counts on a
known-peak fixture, MATLAB-convention NAE, condition grid, runner smoke."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from quantized_spectrum_cartography_tpu.baselines import (
    Condition,
    condition_grid,
    make_problem,
    run_conditions,
    standard_methods,
)
from quantized_spectrum_cartography_tpu.config import PhysicsConfig
from quantized_spectrum_cartography_tpu.ops.metrics import (
    detection_counts,
    nae_tensor,
)


def test_detection_counts_known_peak_fixture():
    """Hand-built map: one emitter at (x=5, y=10).  Bands 0..3 carry power
    0.02 (> low_level 0.01 -> 'peak' events); bands 4..7 carry 0.001
    ('low' events).  Verifies the exact reference event rules
    (joint_opt_ae.m:514-544) including the (x, y) -> [k, y, x] indexing."""
    K, I = 8, 21
    peaks = jnp.asarray([[5.0, 10.0]])          # (x, y)
    T_ref = jnp.zeros((K, I, I))
    T_ref = T_ref.at[:4, 10, 5].set(0.02)
    T_ref = T_ref.at[4:, 10, 5].set(0.001)

    # perfect recovery: no misses, no false detections
    m, p, f, low = detection_counts(T_ref, T_ref, peaks)
    assert (int(p), int(low)) == (4, 4)
    assert int(m) == 0 and int(f) == 0

    # zero recovery: every peak event missed (0 < 0.25*0.02), no false hits
    m, p, f, low = detection_counts(jnp.zeros_like(T_ref), T_ref, peaks)
    assert int(m) == 4 and int(f) == 0

    # recovery hot everywhere: no misses, every low event falsely detected
    # (0.05 > max(0.01, 1.75*0.001))
    m, p, f, low = detection_counts(jnp.full_like(T_ref, 0.05), T_ref, peaks)
    assert int(m) == 0 and int(f) == 4

    # transposed-peak probe: a recovery hot at (row=5, col=10) — the
    # SWAPPED location — must NOT count as detected at (x=5, y=10)
    T_swapped = jnp.zeros_like(T_ref).at[:, 5, 10].set(0.02)
    m, p, f, low = detection_counts(T_swapped, T_ref, peaks)
    assert int(m) == 4      # real peak location still empty -> missed


def test_detection_counts_miss_threshold_boundary():
    K, I = 1, 5
    peaks = jnp.asarray([[2.0, 3.0]])
    T_ref = jnp.zeros((K, I, I)).at[0, 3, 2].set(0.04)
    # exactly at 0.25*ref: NOT a miss (strict <)
    T_hat = jnp.zeros_like(T_ref).at[0, 3, 2].set(0.01)
    m, p, f, low = detection_counts(T_hat, T_ref, peaks)
    assert int(m) == 0
    # just below: miss
    T_hat = jnp.zeros_like(T_ref).at[0, 3, 2].set(0.0099)
    m, *_ = detection_counts(T_hat, T_ref, peaks)
    assert int(m) == 1


def test_nae_tensor_matlab_convention():
    """NAE(T, T_rec, R) = (1/R) sum|T/sum|T| - T_rec/sum|T_rec||
    (joint_opt_ae.m:1014-1016): global-sum normalization, NOT per-factor."""
    X = jnp.asarray([[1.0, 3.0], [2.0, 2.0]])    # global sum 8
    Y = jnp.asarray([[2.0, 6.0], [4.0, 4.0]])    # scaled copy -> NAE 0
    assert float(nae_tensor(Y, X, 2)) < 1e-7
    Z = jnp.asarray([[3.0, 1.0], [2.0, 2.0]])    # swapped first row
    expect = np.abs(np.array([3, 1, 2, 2]) / 8 -
                    np.array([1, 3, 2, 2]) / 8).sum() / 2
    np.testing.assert_allclose(float(nae_tensor(Z, X, 2)), expect, rtol=1e-6)


def test_condition_grid_reference_axes():
    conds = condition_grid("fraction")
    assert [c.fraction for c in conds] == [0.01, 0.05, 0.1, 0.15, 0.2]
    assert all(c.num_emitters == 2 and c.shadow_sigma == 5.0 for c in conds)
    conds = condition_grid("snr", values=(0, 20))
    assert [c.snr for c in conds] == [0, 20]
    assert condition_grid() == (Condition(),)


def test_make_problem_snr_and_mask():
    pcfg = PhysicsConfig(grid_size=21, num_bands=16,
                         decorrelation_distance=30.0)
    cond = dataclasses.replace(Condition(), fraction=0.2, snr=10.0)
    hp = make_problem(jax.random.PRNGKey(0), cond, pcfg)
    assert hp.T_true.shape == (16, 21, 21)
    assert int(jnp.sum(hp.Om)) == round(0.2 * 21 * 21)
    assert hp.sample_idx.shape[0] == int(jnp.sum(hp.Om))
    # SNR noise is additive nonneg uniform: T_noisy >= T_true entrywise
    assert bool(jnp.all(hp.T_noisy >= hp.T_true - 1e-9))
    # observed locations carry the noisy values
    r, c = int(hp.sample_idx[0, 0]), int(hp.sample_idx[0, 1])
    assert bool(hp.Om[r, c])
    np.testing.assert_allclose(np.asarray(hp.T_obs[:, r, c]),
                               np.asarray(hp.T_noisy[:, r, c]), rtol=1e-6)


def test_run_conditions_tps_smoke():
    pcfg = PhysicsConfig(grid_size=21, num_bands=16,
                         decorrelation_distance=30.0)
    methods = standard_methods()          # tps + btd (no trained models)
    methods.pop("btd")                    # keep the smoke cheap
    out = run_conditions(
        methods, condition_grid(base=Condition(fraction=0.3)),
        num_examples=1, physics=pcfg, seed=0)
    (label, per_method), = out.items()
    stats = per_method["tps"]
    assert np.isfinite(stats["sre"])
    assert 0.0 <= stats["miss_prob"] <= 1.0
    assert 0.0 <= stats["false_prob"] <= 1.0
    assert stats["valid"] == 1


def test_detection_stack_wiring_end_to_end():
    """The full nasdac/dowjons method stack (witnessed anchored swap +
    no-extinguish backstop + residual peak patches + round-5 peak-gated
    polish) wired through standard_methods, on a tiny rho=1% problem
    with a function-level completer and generator — no trained weights.
    Guards the wiring that only the TPU measurement tools otherwise
    exercise."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from quantized_spectrum_cartography_tpu.baselines.harness import (
        Condition, make_problem)

    def ae_complete(mask, band):
        # function-level "completion": observed values kept, unobserved
        # filled with the observed mean plus a smoothed spread
        m = mask.astype(band.dtype)
        mean = jnp.sum(band * m) / jnp.maximum(jnp.sum(m), 1.0)
        return band * m + mean * (1.0 - m)

    zdim = 8
    basis = jax.random.normal(jax.random.PRNGKey(0), (zdim, 51 * 51))

    def gen_apply(z):
        return jax.nn.softplus(z @ basis).reshape(z.shape[0], 51, 51) * 0.01

    methods = standard_methods(
        gen_apply=gen_apply, z_dim=zdim, ae_complete=ae_complete,
        dowjons_iters=2, dowjons_restarts=1, btd_restarts=1,
        polish_ridge=0.1, polish_gamma=0.75)
    assert {"nasdac", "dowjons", "deepcomp"} <= set(methods)

    hp = make_problem(jax.random.PRNGKey(1), Condition(fraction=0.01))
    for name in ("deepcomp", "nasdac", "dowjons"):
        out = methods[name](jax.random.PRNGKey(2), hp)
        T_hat = np.asarray(out["T_hat"])
        assert T_hat.shape == hp.T_true.shape, name
        assert np.all(np.isfinite(T_hat)), name
        assert T_hat.min() >= -1e-6, name
        if "C_hat" in out:
            assert np.all(np.asarray(out["C_hat"]) >= -1e-6), name
