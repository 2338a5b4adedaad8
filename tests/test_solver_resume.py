"""Mid-run solver snapshot/resume (SURVEY.md section 5.4): N+M straight
iterations equal N iterations, an (optionally Orbax-round-tripped)
snapshot, then M resumed iterations — bitwise."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from quantized_spectrum_cartography_tpu.config import PhysicsConfig, SolverConfig
from quantized_spectrum_cartography_tpu.ops.quantizer import dither_probit
from quantized_spectrum_cartography_tpu.physics import generate_onebit_problem
from quantized_spectrum_cartography_tpu.solvers.lowrank_mle import (
    SolverState,
    recover_lowrank_mle,
)
from quantized_spectrum_cartography_tpu.training.checkpoints import (
    load_checkpoint,
    save_checkpoint,
)


def _setup():
    pcfg = PhysicsConfig(grid_size=21, num_bands=16,
                         decorrelation_distance=30.0)
    prob = generate_onebit_problem(jax.random.PRNGKey(0), pcfg,
                                   sample_fraction=1.0)
    mean, std = pcfg.mean_slf, 0.008
    T_obs = dither_probit(jax.random.PRNGKey(1), prob.T_true - mean, std)
    R, I, J, K = prob.shape
    S0 = 0.01 * jax.random.normal(jax.random.PRNGKey(2), (R, I, J))
    C0 = 0.01 * jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (R, K)))
    scfg = SolverConfig(max_iters=20, s_inner_iters=2, c_inner_iters=2,
                        lr_s=0.001, lr_c=0.001, projection_interval=3,
                        rank_truncation=10)
    return T_obs, S0, C0, scfg, mean, std


def test_resume_matches_straight_run():
    T_obs, S0, C0, scfg, mean, std = _setup()

    straight = recover_lowrank_mle(T_obs, S0, C0, scfg, mean, std)

    half = dataclasses.replace(scfg, max_iters=10)
    first = recover_lowrank_mle(T_obs, S0, C0, half, mean, std)
    snap = first.aux["state"]
    assert int(snap.iteration) == 10
    second = recover_lowrank_mle(T_obs, S0, C0, half, mean, std,
                                 state=snap)

    # projection cadence (interval 3, absolute iteration) continues
    # across the boundary and the trajectories are identical
    np.testing.assert_array_equal(np.asarray(second.S),
                                  np.asarray(straight.S))
    np.testing.assert_array_equal(np.asarray(second.C),
                                  np.asarray(straight.C))
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(first.costs), np.asarray(second.costs)]),
        np.asarray(straight.costs))
    assert int(second.aux["state"].iteration) == 20


def test_resume_orbax_round_trip(tmp_path):
    T_obs, S0, C0, scfg, mean, std = _setup()
    half = dataclasses.replace(scfg, max_iters=10)
    first = recover_lowrank_mle(T_obs, S0, C0, half, mean, std)
    snap = first.aux["state"]

    path = str(tmp_path / "solver_snap")
    save_checkpoint(path, snap)
    restored = load_checkpoint(path, target=snap)
    # target-structured restore preserves the SolverState pytree
    assert isinstance(restored, SolverState)

    resumed = recover_lowrank_mle(T_obs, S0, C0, half, mean, std,
                                  state=restored)
    direct = recover_lowrank_mle(T_obs, S0, C0, half, mean, std, state=snap)
    np.testing.assert_array_equal(np.asarray(resumed.S),
                                  np.asarray(direct.S))
    np.testing.assert_array_equal(np.asarray(resumed.C),
                                  np.asarray(direct.C))
