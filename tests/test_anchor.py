"""Round-4 components: completion-anchored C fit, latent-descent DowJons,
decoder heads.

Covers:
- anchor_weight schedule (full at rho->0, zero at/above rho0);
- recover_dowjons_ae_latent end-to-end on a small problem (finite,
  improves over zero);
- _polish_c_to_observed pins unidentifiable amplitudes at anchored
  values while letting observed ones fit the data;
- Decoder heads: softplus output is unbounded-above/nonnegative,
  scaled_sigmoid trains a gain parameter; VAE plumbs head/dec_width.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_spectrum_cartography_tpu.models import VAE, Autoencoder
from quantized_spectrum_cartography_tpu.models.ae import Decoder
from quantized_spectrum_cartography_tpu.ops.lowrank import get_tensor
from quantized_spectrum_cartography_tpu.solvers.completion import (
    _polish_c_to_observed,
    recover_dowjons_ae_latent,
)
from quantized_spectrum_cartography_tpu.solvers.nasdac import anchor_weight
from quantized_spectrum_cartography_tpu.training.ae_trainer import (
    make_ae_latent_fns,
)


def test_anchor_weight_schedule():
    I = 10
    W_empty = jnp.zeros((I, I))
    W_full = jnp.ones((I, I))
    assert float(anchor_weight(W_empty, 0.3, 0.05)) == pytest.approx(0.3)
    assert float(anchor_weight(W_full, 0.3, 0.05)) == 0.0
    # 2.5% observed -> half weight (I*I = 100 -> hit 2.5% exactly with
    # a 40-cell grid scaled up: use 1000 cells, 25 observed)
    W_half = jnp.zeros((1000,)).at[:25].set(1.0)
    assert float(anchor_weight(W_half, 0.3, 0.05)) == \
        pytest.approx(0.15, abs=1e-6)


def test_polish_keeps_unobserved_emitter_amplitude():
    # emitter 0 fully observed, emitter 1 has no observed support: the
    # polished C must keep emitter 1's anchored amplitude and recover
    # emitter 0's true amplitude from the data
    I = J = 8
    K = 4
    S = jnp.zeros((2, I, J)).at[0, :4, :].set(1.0).at[1, 6:, :].set(1.0)
    C_true = jnp.asarray([[2.0, 1.0, 0.5, 0.1], [1.0, 2.0, 0.2, 0.4]])
    T = get_tensor(S, C_true)
    W = jnp.zeros((1, I, J)).at[0, :4, :].set(1.0)   # observe only emitter 0
    C_anchor = C_true * jnp.asarray([[0.5], [1.0]])  # em0 anchored WRONG
    C = _polish_c_to_observed(S, C_anchor, T, W, ridge_rel=0.05)
    # emitter 0 snaps to the observed truth despite the wrong anchor
    np.testing.assert_allclose(np.asarray(C[0]), np.asarray(C_true[0]),
                               atol=0.15)
    # emitter 1 (unobserved) stays at its anchored value
    np.testing.assert_allclose(np.asarray(C[1]), np.asarray(C_anchor[1]),
                               atol=0.15)


@pytest.fixture(scope="module")
def tiny_ae():
    model = Autoencoder(activation="selu")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 51, 51, 2)), train=False)
    return model, variables


def test_dowjons_ae_latent_runs(tiny_ae):
    model, variables = tiny_ae
    enc, dec = make_ae_latent_fns(model, variables, scale=2.5)
    key = jax.random.PRNGKey(1)
    S_true = jax.random.uniform(key, (2, 51, 51)) * 0.05
    C_true = jax.random.uniform(jax.random.fold_in(key, 1), (2, 64))
    T = get_tensor(S_true, C_true)
    Om = jax.random.bernoulli(jax.random.fold_in(key, 2), 0.2, (51, 51))
    T_obs = T * Om.astype(T.dtype)[None]
    res = recover_dowjons_ae_latent(T_obs, Om, enc, dec,
                                    num_emitters=2, outer_iters=3,
                                    z_steps=3, T_true=T)
    assert np.isfinite(float(res.costs[-1]))
    assert res.S.shape == (2, 51, 51)
    assert res.C.shape == (2, 64)
    assert float(jnp.min(res.C)) >= 0.0
    # the shared objective decreases across outer iterations
    assert float(res.costs[-1]) <= float(res.costs[0]) + 1e-6


def test_dowjons_ae_latent_anchored_runs(tiny_ae):
    model, variables = tiny_ae
    enc, dec = make_ae_latent_fns(model, variables, scale=2.5)
    key = jax.random.PRNGKey(3)
    S_true = jax.random.uniform(key, (2, 51, 51)) * 0.05
    C_true = jax.random.uniform(jax.random.fold_in(key, 1), (2, 64))
    T = get_tensor(S_true, C_true)
    Om = jax.random.bernoulli(jax.random.fold_in(key, 2), 0.01, (51, 51))
    T_obs = T * Om.astype(T.dtype)[None]
    res = recover_dowjons_ae_latent(
        T_obs, Om, enc, dec, num_emitters=2, outer_iters=2, z_steps=2,
        T_anchor=T * 0.9)
    assert np.isfinite(float(res.costs[-1]))


def test_residual_peak_refine_lifts_underfit_peak():
    from quantized_spectrum_cartography_tpu.solvers.completion import (
        residual_peak_refine)
    I = J = 51
    K = 8
    yy = jnp.arange(I, dtype=jnp.float32)[:, None]
    xx = jnp.arange(J, dtype=jnp.float32)[None, :]
    d = jnp.sqrt(jnp.square(yy - 2.0) + jnp.square(xx - 10.0))
    bump = jnp.minimum(1.0, (jnp.maximum(d, 1e-6) / 2.0) ** -2.25)
    amps = jnp.linspace(0.5, 1.0, K)
    T_true = amps[:, None, None] * bump[None]
    T_hat = 0.1 * T_true                      # extinguished peak
    W = (jax.random.uniform(jax.random.PRNGKey(0), (I, J)) < 0.1
         ).astype(jnp.float32)
    out = residual_peak_refine(T_hat, T_true * W[None], W, num_patches=1)
    # the patch lifts the (unobserved) peak pixel toward truth
    before = float(T_hat[:, 2, 10].mean() / T_true[:, 2, 10].mean())
    after = float(out[:, 2, 10].mean() / T_true[:, 2, 10].mean())
    assert after > 0.5 and after > before
    # where the model already fits, the patch is a no-op
    out2 = residual_peak_refine(T_true, T_true * W[None], W,
                                num_patches=2)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(T_true),
                               atol=1e-5)


def test_witnessed_swap_flag_fires_and_gates():
    from quantized_spectrum_cartography_tpu.solvers.nasdac import (
        witnessed_swap_flag)
    I = J = 51
    K = 4
    yy = jnp.arange(I, dtype=jnp.float32)[:, None]
    xx = jnp.arange(J, dtype=jnp.float32)[None, :]
    d = jnp.sqrt(jnp.square(yy - 25.0) + jnp.square(xx - 25.0))
    bump = jnp.minimum(1.0, (jnp.maximum(d, 1e-6) / 2.0) ** -2.25)
    T_wit = jnp.broadcast_to(bump[None], (K, I, J))
    W = jnp.ones((I, J))
    T_obs = T_wit                              # data supports the witness
    # current solution extinguishes the witnessed peak -> fires
    assert bool(witnessed_swap_flag(0.05 * T_wit, T_wit, T_wit, T_obs,
                                    W, 2))
    # current solution carries the peak -> does not fire
    assert not bool(witnessed_swap_flag(T_wit, T_wit, T_wit, T_obs,
                                        W, 2))
    # dense data that CONTRADICTS the witness (obs ~ 0) gates the swap:
    # the candidate fits the local observations no better
    T_obs0 = jnp.zeros_like(T_wit)
    assert not bool(witnessed_swap_flag(0.05 * T_wit, T_wit, T_wit,
                                        T_obs0, W, 2))


@pytest.mark.parametrize("head", ["softplus", "scaled_sigmoid"])
def test_decoder_heads(head):
    dec = Decoder(activation="selu", head=head)
    variables = dec.init(jax.random.PRNGKey(0), jnp.zeros((2, 256)),
                         train=False)
    out = dec.apply(variables, jax.random.normal(
        jax.random.PRNGKey(1), (2, 256)) * 3.0, train=False)
    assert out.shape == (2, 51, 51, 1)
    assert float(jnp.min(out)) >= 0.0
    if head == "scaled_sigmoid":
        flat = jax.tree_util.tree_leaves_with_path(variables["params"])
        assert any("log_gain" in jax.tree_util.keystr(p) for p, _ in flat)


def test_vae_head_plumbing():
    vae = VAE(latent_dim=8, head="softplus", dec_width=32)
    variables = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 51, 51, 2)),
                         jax.random.PRNGKey(1), train=False)
    out = vae.apply(variables, jnp.ones((3, 8)), train=False,
                    method=VAE.decode)
    assert out.shape == (3, 51, 51, 1)
    assert float(jnp.min(out)) >= 0.0


def test_witness_peaks_finds_maxima():
    from quantized_spectrum_cartography_tpu.solvers.nasdac import (
        witness_peaks)
    I = J = 51
    M = jnp.zeros((I, J)).at[10, 40].set(2.0).at[30, 5].set(1.0)
    pts = witness_peaks(M[None], num_peaks=2, radius=4)
    got = {(int(y), int(x)) for y, x in np.asarray(pts)}
    assert got == {(10, 40), (30, 5)}


def test_peak_gated_blend_guarantee_and_passthrough():
    from quantized_spectrum_cartography_tpu.solvers.completion import (
        peak_gated_blend)
    I = J = 8
    K = 3
    # two emitters; protect the peak pixel of each
    S = jnp.zeros((2, I, J)).at[0, 1, 1].set(1.0).at[1, 6, 6].set(1.0)
    peaks = jnp.asarray([[1, 1], [6, 6]], jnp.int32)
    C_anch = jnp.asarray([[1.0, 1.0, 1.0], [1.0, 1.0, 1.0]])
    # polished: band 0 keeps peaks (scale 0.9 >= gamma), band 1
    # extinguishes emitter 1, band 2 raises amplitudes
    C_pol = jnp.asarray([[0.9, 0.5, 2.0], [0.9, 0.0, 2.0]])
    C = peak_gated_blend(S, C_anch, C_pol, peaks, gamma=0.8)
    # bands 0 and 2 pass through fully polished
    np.testing.assert_allclose(np.asarray(C[:, 0]), [0.9, 0.9], atol=1e-6)
    np.testing.assert_allclose(np.asarray(C[:, 2]), [2.0, 2.0], atol=1e-6)
    # band 1: the rendered value at every protected peak stays
    # >= gamma * anchored value (the closed-form guarantee)
    v_anch = np.einsum("rij,rk->kij", np.asarray(S), np.asarray(C_anch))
    v_out = np.einsum("rij,rk->kij", np.asarray(S), np.asarray(C))
    for (y, x) in [(1, 1), (6, 6)]:
        assert v_out[1, y, x] >= 0.8 * v_anch[1, y, x] - 1e-6
    # and band 1 still moved toward the polished values for emitter 0
    assert float(C[0, 1]) < 1.0


def test_gated_polish_c_end_to_end():
    from quantized_spectrum_cartography_tpu.solvers.completion import (
        gated_polish_c)
    I = J = 8
    K = 4
    S = jnp.zeros((2, I, J)).at[0, :4, :].set(1.0).at[1, 6:, :].set(1.0)
    C_true = jnp.asarray([[2.0, 1.0, 0.5, 0.1], [1.0, 2.0, 0.2, 0.4]])
    T = get_tensor(S, C_true)
    W = jnp.zeros((1, I, J)).at[0, :4, :].set(1.0)  # observe emitter 0 only
    C_anchor = C_true * jnp.asarray([[0.5], [1.0]])
    C = gated_polish_c(S, C_anchor, T, W, T_wit=T, num_peaks=2,
                       ridge_rel=0.05, gamma=0.8)
    # the witnessed emitter-1 peak keeps >= gamma of its anchored render
    v_anch = np.einsum("rij,rk->kij", np.asarray(S), np.asarray(C_anchor))
    v_out = np.einsum("rij,rk->kij", np.asarray(S), np.asarray(C))
    assert (v_out[:, 7, 0] >= 0.8 * v_anch[:, 7, 0] - 1e-6).all()
    # observed emitter-0 amplitudes still improve over the wrong anchor
    err_anch = float(jnp.sum(jnp.abs(C_anchor[0] - C_true[0])))
    err_out = float(jnp.sum(jnp.abs(C[0] - C_true[0])))
    assert err_out < err_anch


def test_distance_to_observed_and_confidence():
    from quantized_spectrum_cartography_tpu.solvers.nasdac import (
        anchor_confidence, distance_to_observed)
    I = 12
    W = jnp.zeros((I, I)).at[2, 3].set(1.0).at[9, 9].set(1.0)
    D = distance_to_observed(W)
    assert float(D[2, 3]) == 0.0 and float(D[9, 9]) == 0.0
    np.testing.assert_allclose(float(D[2, 6]), 3.0, atol=1e-5)
    np.testing.assert_allclose(float(D[5, 7]), np.sqrt(16 + 4), atol=1e-5)
    conf = anchor_confidence(W, tau=4.0)
    assert float(conf[2, 3]) == 1.0            # observed
    assert float(conf[2, 4]) == 1.0            # within the 1px grace
    assert float(conf[2, 6]) < 1.0             # decays beyond it
    # monotone in distance
    assert float(conf[2, 6]) > float(conf[2, 9])


def test_constrained_polish_dominates_blend():
    # The blend's output is feasible for the per-band constrained QP, so
    # at equal peak protection the QP polish must score at least as well
    # on the TOTAL objective (observed residual + ridge toward C_anch —
    # NOT the observed residual alone: the QP may trade a smaller ridge
    # term for slightly more residual); both must satisfy the gamma
    # guarantee (the QP via its final exact blend in mode='qp').
    from quantized_spectrum_cartography_tpu.solvers.completion import (
        _constrained_polish_c, _polish_c_to_observed, gated_polish_c,
        peak_gated_blend)
    key = jax.random.PRNGKey(3)
    R, K, I, J = 2, 12, 20, 20
    kS, kC, kW = jax.random.split(key, 3)
    S = jax.nn.softplus(jax.random.normal(kS, (R, I, J)))
    C_true = jax.nn.relu(jax.random.normal(kC, (R, K))) + 0.1
    T = jnp.einsum("rij,rk->kij", S, C_true)
    W = (jax.random.uniform(kW, (1, I, J)) < 0.06).astype(jnp.float32)
    T_obs = T * W
    C_anch = C_true * 1.5                      # amplitude-imprinted anchor
    peaks = jnp.array([[4, 6], [15, 11]], jnp.int32)
    gamma = 0.75

    C_qp = _constrained_polish_c(S, C_anch, T_obs, W, peaks, gamma=gamma,
                                 ridge_rel=0.1)
    C_pol = _polish_c_to_observed(S, C_anch, T_obs, W, ridge_rel=0.1)
    C_bl = peak_gated_blend(S, C_anch, C_pol, peaks, gamma=gamma)

    # same lam as _constrained_polish_c / _polish_c_to_observed
    S_obs = S.reshape(2, -1) * W.reshape(1, -1)
    lam = 0.1 * float(jnp.trace(S_obs @ S_obs.T)) / 2

    def total_obj(C):
        r = jnp.einsum("rij,rk->kij", S, C) - T_obs
        return (float(jnp.sum(W * r * r))
                + lam * float(jnp.sum(jnp.square(C - C_anch))))

    assert float(jnp.min(C_qp)) >= 0.0
    assert total_obj(C_qp) <= total_obj(C_bl) + 1e-4

    # end-to-end mode='qp': exact feasibility via the final blend
    C_out = gated_polish_c(S, C_anch, T_obs, W, T_wit=T, num_peaks=2,
                           ridge_rel=0.1, gamma=gamma, mode="qp")
    # gated_polish_c picks its own witness peaks from T; re-derive them
    from quantized_spectrum_cartography_tpu.solvers.nasdac import (
        witness_peaks)
    pts = witness_peaks(T, 2)
    s_at = S[:, pts[:, 0], pts[:, 1]]
    v_anch = jnp.einsum("rp,rk->kp", s_at, C_anch)
    v_out = jnp.einsum("rp,rk->kp", s_at, C_out)
    assert bool(jnp.all(v_out >= gamma * v_anch - 1e-5))


def test_gated_polish_c_rejects_unknown_mode():
    from quantized_spectrum_cartography_tpu.solvers.completion import (
        gated_polish_c)
    S = jnp.ones((2, 8, 8))
    C = jnp.ones((2, 4))
    T = jnp.ones((4, 8, 8))
    W = jnp.ones((1, 8, 8))
    with pytest.raises(ValueError, match="polish mode"):
        gated_polish_c(S, C, T, W, T_wit=T, num_peaks=2, mode="QP")
