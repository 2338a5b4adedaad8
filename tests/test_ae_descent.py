"""AE-latent run_descent (reference early-stop semantics,
nn_descent_ae.py:72-142) and the DowJons-AE alternation built on it."""

import jax
import jax.numpy as jnp
import numpy as np

from quantized_spectrum_cartography_tpu.config import PhysicsConfig
from quantized_spectrum_cartography_tpu.models import Autoencoder
from quantized_spectrum_cartography_tpu.physics import generate_onebit_problem
from quantized_spectrum_cartography_tpu.solvers.completion import (
    recover_dowjons_ae,
    run_descent_ae,
)
from quantized_spectrum_cartography_tpu.training.ae_trainer import (
    AETrainConfig,
    make_ae_input_fn,
    train_ae,
)

PHYS = PhysicsConfig(decorrelation_distance=30.0)


def _tiny_ae():
    cfg = AETrainConfig(steps=30, batch_size=8)
    variables, diag = train_ae(jax.random.PRNGKey(0), cfg, PHYS,
                               log_every=10, log_fn=lambda *a: None)
    return make_ae_input_fn(Autoencoder(), variables, diag["scale"]), \
        diag["scale"]


def _problem():
    prob = generate_onebit_problem(jax.random.PRNGKey(1), PHYS,
                                   sample_fraction=0.3)
    return prob


def test_run_descent_ae_improves_and_stops():
    ae_apply, scale = _tiny_ae()
    prob = _problem()
    R, I, J, K = prob.shape
    W = prob.Om.astype(jnp.float32)
    T_obs = prob.T_true * W[None]
    x0 = jnp.stack([jnp.broadcast_to(W, (R, I, J)),
                    prob.S_true * scale], -1)
    C = prob.C_true

    x, S, iters, final_loss = run_descent_ae(
        ae_apply, x0, C, T_obs, W[None])
    assert S.shape == (R, I, J)
    assert np.isfinite(float(final_loss))
    assert 1 <= int(iters) <= 10

    # reference check-then-step order: with an impossible tolerance the
    # loop must break at the FIRST allowed check (min_iters reached),
    # i.e. run exactly min_iters + 1 bodies
    _, _, iters_tol, _ = run_descent_ae(
        ae_apply, x0, C, T_obs, W[None], tol=jnp.inf, min_iters=5)
    assert int(iters_tol) == 6

    # and with tol=-inf (improvement test never fires) runs to max_iters
    _, _, iters_max, _ = run_descent_ae(
        ae_apply, x0, C, T_obs, W[None], tol=-jnp.inf, max_iters=7)
    assert int(iters_max) == 7


def test_run_descent_ae_loss_decreases():
    ae_apply, scale = _tiny_ae()
    prob = _problem()
    R, I, J, K = prob.shape
    W = prob.Om.astype(jnp.float32)
    T_obs = prob.T_true * W[None]
    x0 = jnp.stack([jnp.broadcast_to(W, (R, I, J)),
                    jnp.zeros((R, I, J))], -1)
    C = prob.C_true

    from quantized_spectrum_cartography_tpu.ops.lowrank import get_tensor

    def cost(x):
        return float(jnp.sum(jnp.square(
            W[None] * (get_tensor(ae_apply(x), C) - T_obs))))

    x, _, _, final_loss = run_descent_ae(
        ae_apply, x0, C, T_obs, W[None], tol=-jnp.inf, max_iters=10)
    assert cost(x) <= cost(x0) + 1e-6


def test_recover_dowjons_ae_end_to_end():
    ae_apply, _ = _tiny_ae()
    prob = _problem()
    R, I, J, K = prob.shape
    res = recover_dowjons_ae(
        prob.T_true * prob.Om.astype(jnp.float32)[None], prob.Om,
        ae_apply, num_emitters=R, outer_iters=3, T_true=prob.T_true)
    assert res.S.shape == (R, I, J)
    assert res.C.shape == (R, K)
    assert res.T_hat.shape == (K, I, J)
    assert np.all(np.isfinite(np.asarray(res.costs)))
    assert np.all(np.asarray(res.C) >= 0.0)
    # costs non-increasing-ish: last <= first (alternation makes progress)
    costs = np.asarray(res.costs)
    assert costs[-1] <= costs[0] + 1e-6


def test_dowjons_ae_registered_in_harness():
    from quantized_spectrum_cartography_tpu.baselines import standard_methods
    ae_apply, _ = _tiny_ae()
    methods = standard_methods(ae_input_apply=ae_apply)
    assert "dowjons_ae" in methods


def test_dowjons_alias_pops_variant_key():
    """The 'dowjons' alias must REPLACE its variant key, not duplicate
    it: a consumer running the full registry (cli conditions with no
    filter) would otherwise execute the most expensive solver twice
    under two names (round-4 ADVICE)."""
    from quantized_spectrum_cartography_tpu.baselines import standard_methods

    def fake_gen(z):
        import jax.numpy as jnp
        return jnp.zeros((z.shape[0], 51, 51))

    methods = standard_methods(gen_apply=fake_gen, dowjons_variant="gan")
    assert "dowjons" in methods
    assert "dowjons_gan" not in methods
