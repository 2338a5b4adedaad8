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


def test_mle_gan_resume_matches_straight_run():
    """MLE-GAN snapshot/resume: the absolute-iteration z-search fires in
    the first segment only, and N+M resumed iterations equal N+M straight
    ones bitwise."""
    from quantized_spectrum_cartography_tpu.config import QuantizerConfig
    from quantized_spectrum_cartography_tpu.ops import boundaries as B
    from quantized_spectrum_cartography_tpu.ops.quantizer import quantize_log
    from quantized_spectrum_cartography_tpu.solvers.mle_gan import (
        recover_mle_gan,
    )

    R, K, I, z_dim = 2, 8, 16, 6
    key = jax.random.PRNGKey(0)
    W = 0.05 * jax.random.normal(key, (z_dim, I * I))

    def gen_apply(Z):
        return jax.nn.sigmoid(Z @ W).reshape(Z.shape[0], I, I) * 0.02

    S_true = gen_apply(jax.random.normal(jax.random.PRNGKey(1), (R, z_dim)))
    C_true = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (R, K)))
    from quantized_spectrum_cartography_tpu.ops.lowrank import get_tensor
    T = get_tensor(S_true, C_true)
    qcfg = QuantizerConfig(boundaries=B.QUANTIZATION_BOUNDARIES_4_BINS,
                           noise_std=5.0, log_offset=B.LOG_OFFSET_4)
    bb = jnp.asarray(np.array(qcfg.boundaries))
    Y = quantize_log(jax.random.PRNGKey(3), T, 5.0, bb, qcfg.log_offset)
    mask = jnp.ones_like(Y, jnp.float32)

    def cfg(iters):
        return SolverConfig(max_iters=iters, z_dim=z_dim,
                            z_search_at_iter=2, z_search_global=8,
                            z_search_local=8, s_inner_iters=1,
                            c_inner_iters=1)

    kw = dict(num_emitters=R, use_fused=True, nll_mode="xla")
    Z0 = jax.random.normal(jax.random.PRNGKey(4), (R, z_dim))
    straight = recover_mle_gan(jax.random.PRNGKey(5), Y, mask, gen_apply,
                               cfg(8), qcfg, Z_init=Z0, **kw)
    first = recover_mle_gan(jax.random.PRNGKey(5), Y, mask, gen_apply,
                            cfg(4), qcfg, Z_init=Z0, **kw)
    snap = first.aux["state"]
    assert int(snap.iteration) == 4
    second = recover_mle_gan(jax.random.PRNGKey(5), Y, mask, gen_apply,
                             cfg(4), qcfg, state=snap, **kw)

    np.testing.assert_array_equal(np.asarray(second.C),
                                  np.asarray(straight.C))
    np.testing.assert_array_equal(np.asarray(second.aux["Z"]),
                                  np.asarray(straight.aux["Z"]))
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(first.costs), np.asarray(second.costs)]),
        np.asarray(straight.costs))
