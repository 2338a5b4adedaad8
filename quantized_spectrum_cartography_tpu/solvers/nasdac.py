"""Nasdac: SPA initialization + autoencoder completion.

Re-design of the harness's Nasdac method (`backup/algorithms/
joint_opt_ae.m:213-277`): SPA on the unfolded sampled tensor picks
near-pure frequency bands whose spatial columns seed per-emitter SLFs;
each (masked) SLF estimate is completed by the trained AE
(`py.nn_descent_ae.model_ae`), and the PSD factor is refit by NNLS on the
completed SLFs.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from quantized_spectrum_cartography_tpu.baselines.nnls import nnls_rows
from quantized_spectrum_cartography_tpu.baselines.spa import nmf_spa
from quantized_spectrum_cartography_tpu.ops.lowrank import get_tensor
from quantized_spectrum_cartography_tpu.solvers.base import RecoveryResult


def lost_peak_flag(
    T_hat: jnp.ndarray,
    T_comp: jnp.ndarray,
    num_peaks: int,
    radius: int = 4,
    thresh: float = 0.3,
) -> jnp.ndarray:
    """Completion-witnessed catastrophe detector (ground-truth-free).

    The factorization's one catastrophic failure mode is extinguishing an
    emitter entirely (measured: at rho=7.5% ALL DowJons misses came from
    2/50 examples whose lost emitter rendered at 0.05-0.14x with the peak
    pixel unobserved).  The per-band AE completion `T_comp` sees those
    peaks; so take the `num_peaks` witness peaks (`witness_peaks` — the
    single peak-extraction convention every witness gate shares) and
    flag the example when the factored estimate carries < `thresh` of
    the completion's value at any of them.  Flagged examples are
    re-solved (or swapped) with the completion anchor active.  Returns a
    scalar bool."""
    pts = witness_peaks(T_comp, num_peaks, radius)        # [P, 2] (y, x)
    M_comp = jnp.sum(T_comp, axis=0)
    M_hat = jnp.sum(T_hat, axis=0)
    ratios = (M_hat[pts[:, 0], pts[:, 1]]
              / jnp.maximum(M_comp[pts[:, 0], pts[:, 1]], 1e-12))
    return jnp.min(ratios) < thresh


def witnessed_swap_flag(
    T_cur: jnp.ndarray,
    T_cand: jnp.ndarray,
    T_wit: jnp.ndarray,
    T_obs: jnp.ndarray,
    W: jnp.ndarray,
    num_peaks: int,
    radius: int = 4,
    thresh: float = 0.3,
    fit_factor: float = 0.7,
    window: int = 5,
    min_obs: float = 3.0,
) -> jnp.ndarray:
    """`lost_peak_flag` with a local data-support gate.

    The bare ratio test over-fires when the witness has spurious local
    maxima (shadow bumps) the current solution legitimately omits —
    measured: widening the witness to R+2 peaks fixed 1-5% sampling but
    introduced 9 swap-induced miss events at 10%.  So a disputed peak
    only triggers the swap when the candidate ALSO fits the observed
    entries in a (2*window+1)^2 neighborhood of that peak decisively
    better (masked squared residual < fit_factor x the current
    solution's) — real emitters leave their amplitude in the nearby
    samples; spurious bumps do not.  When the neighborhood holds fewer
    than `min_obs` observed locations the data cannot adjudicate and the
    ratio test alone decides (at 1% sampling an 11x11 window averages
    ~1.2 samples; requiring data support there blocked every beneficial
    swap).  All inputs [K, I, J] except W [I, J].  Returns scalar
    bool."""
    pts = witness_peaks(T_wit, num_peaks, radius)         # [P, 2] (y, x)
    M_wit = jnp.sum(T_wit, axis=0)
    M_cur = jnp.sum(T_cur, axis=0)
    I, J = M_wit.shape
    yy = jnp.arange(I)[:, None]
    xx = jnp.arange(J)[None, :]
    Wb = W[None]

    def one_peak(pt):
        y, x = pt[0], pt[1]
        ratio = M_cur[y, x] / jnp.maximum(M_wit[y, x], 1e-12)
        near = ((jnp.abs(yy - y) <= window)
                & (jnp.abs(xx - x) <= window)).astype(T_obs.dtype)[None]
        e_cur = jnp.sum(near * Wb * jnp.square(T_obs - T_cur))
        e_cand = jnp.sum(near * Wb * jnp.square(T_obs - T_cand))
        n_loc = jnp.sum(near[0] * W)
        supported = ((e_cand < fit_factor * e_cur)
                     | (n_loc < min_obs))
        return (ratio < thresh) & supported

    return jnp.any(jax.vmap(one_peak)(pts))


def witness_peaks(
    T_wit: jnp.ndarray,
    num_peaks: int,
    radius: int = 4,
) -> jnp.ndarray:
    """Greedy spatial maxima of the witness's band-summed map with square
    non-max suppression of `radius` — the same peak extraction the
    completion-witness machinery uses (`lost_peak_flag`), returned as
    coordinates so downstream amplitude gates can protect them.
    T_wit [K, I, J]; returns [num_peaks, 2] int32 (y, x)."""
    M = jnp.sum(T_wit, axis=0)
    I, J = M.shape
    yy = jnp.arange(I)[:, None]
    xx = jnp.arange(J)[None, :]

    def body(M, _):
        idx = jnp.argmax(M)
        y, x = idx // J, idx % J
        M = jnp.where((jnp.abs(yy - y) <= radius)
                      & (jnp.abs(xx - x) <= radius), -jnp.inf, M)
        return M, jnp.stack([y, x]).astype(jnp.int32)

    _, pts = jax.lax.scan(body, M, None, length=num_peaks)
    return pts


def distance_to_observed(W: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel Euclidean distance to the nearest OBSERVED location.

    W [I, J] (bool/0-1 mask) -> D [I, J] in pixels (0 at observed
    pixels; inf only if the mask is empty).  Brute force over the
    static pairwise grid — [IJ, IJ] = 2601^2 at the reference geometry,
    a trivial min-reduce on the MXU's neighbors and shared across a
    vmapped batch (the distance grid is mask-independent)."""
    I, J = W.shape
    yy, xx = jnp.meshgrid(jnp.arange(I), jnp.arange(J), indexing="ij")
    coords = jnp.stack([yy.ravel(), xx.ravel()], 1).astype(jnp.float32)
    d2 = jnp.sum(jnp.square(coords[:, None] - coords[None]), -1)
    wf = W.reshape(-1) > 0
    d2 = jnp.where(wf[None, :], d2, jnp.inf)
    return jnp.sqrt(jnp.min(d2, axis=1)).reshape(I, J)


def anchor_confidence(
    W: jnp.ndarray,
    tau: float,
) -> jnp.ndarray:
    """Completion-confidence weight per unobserved entry: exp(-max(D-1,
    0)/tau) where D is the distance to the nearest observed sample.

    Rationale (round 5): the AE completion's error grows with distance
    from its nearest observation, but the flat anchor weighted every
    unobserved entry equally — imprinting the completion's amplitude
    error hardest exactly where the completion is least trustworthy.
    Decaying the anchor weight with distance keeps the design
    reconditioning near samples (where completion is near-exact) while
    shrinking the far-field imprint.  tau in pixels; tau=inf recovers
    the flat anchor.  W [I, J]; returns [I, J] in (0, 1]."""
    D = distance_to_observed(W)
    return jnp.exp(-jnp.maximum(D - 1.0, 0.0) / tau)


def anchor_weight(
    W: jnp.ndarray,
    mu0: float = 0.3,
    rho0: float = 0.05,
) -> jnp.ndarray:
    """Completion-anchor weight for the amplitude (C) fit, from the mask.

    At very sparse sampling the observed [N_obs, R] NNLS design can carry
    ~no energy from an emitter whose SLF support the samples missed; NNLS
    then zeroes that emitter's PSD and every one of its peak events is
    missed (the round-4 measured catastrophic low-rho mode: 18/50
    examples at rho=1%, tools/dense_cfit_diag.py).  Anchoring the fit on
    the per-band AE completion at UNOBSERVED entries reconditions the
    design (rho=1% miss 0.369 -> 0.224); at rho >= 5% the unanchored fit
    is already best (0.0205 vs 0.0295), so the weight decays linearly to
    zero by rho0.  Traced (mask-derived), so one compiled program covers
    the whole fraction axis."""
    f_hat = jnp.mean(W)
    return mu0 * jnp.clip(1.0 - f_hat / rho0, 0.0, 1.0)


def recover_nasdac(
    T_obs: jnp.ndarray,
    Om: jnp.ndarray,
    ae_complete: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    num_emitters: int = 2,
    nnls_iters: int = 200,
    anchor_mu0: float = 0.3,
    anchor_rho0: float = 0.05,
    polish_ridge: float = 0.0,
    polish_gamma: Optional[float] = None,
    polish_peaks_extra: int = 2,
    polish_floor: float = 0.0,
    anchor_conf_tau: float = 0.0,
    polish_mode: str = "blend",
) -> RecoveryResult:
    """T_obs [K, I, J] sampled at per-location mask Om [I, J] (zeros
    elsewhere); ae_complete(mask, slf) -> completed slf [I, J].

    Upgrades over the reference's Nasdac (both disclosed in RESULTS.md):
    C refit by NNLS on the completed SLFs (the reference keeps the SPA
    pseudo-inverse C, joint_opt_ae.m:231-241), and the low-rho
    completion-anchored C fit (`anchor_weight`; anchor_mu0=0 restores
    the observed-entries-only fit).  `anchor_conf_tau` > 0 scales the
    per-entry anchor weight by `anchor_confidence` (exp decay in the
    distance to the nearest observed sample, tau pixels) — the flat
    anchor imprints the completion's amplitude error hardest exactly
    where the completion is least trustworthy."""
    K, I, J = T_obs.shape
    R = num_emitters
    W = Om.astype(T_obs.dtype)

    # SPA on the sampled unfolding (observed spatial columns)
    C0, S_flat = nmf_spa((T_obs * W[None]).reshape(K, -1), R)
    S0 = S_flat.reshape(R, I, J)

    # AE completion of each masked SLF estimate
    S_hat = jnp.stack([ae_complete(W, S0[r]) for r in range(R)])

    # refit C by NNLS on the completed SLFs: observed entries at weight 1
    # + (below rho0 sampling) AE-completed entries at weight mu
    mu = (anchor_weight(W, anchor_mu0, anchor_rho0)
          if anchor_mu0 > 0.0 else 0.0)
    if anchor_mu0 > 0.0:
        T_comp = jax.vmap(lambda band: ae_complete(W, band))(T_obs)
        T_fit = T_obs * W[None] + T_comp * (1.0 - W[None])
        conf = (anchor_confidence(W, anchor_conf_tau)
                if anchor_conf_tau > 0.0 else 1.0)
        Wf = jnp.sqrt(W[None]
                      + mu * conf * (1.0 - W[None])).reshape(1, -1)
    else:
        T_fit = T_obs * W[None]
        Wf = W.reshape(1, -1)
    design = (S_hat.reshape(R, -1) * Wf).T                  # [IJ, R]
    C_hat = nnls_rows(design, T_fit.reshape(K, -1) * Wf,
                      iters=nnls_iters).T                    # [R, K]
    if anchor_mu0 > 0.0 and polish_ridge > 0.0:
        if polish_gamma is not None:
            # peak-gated observed-entry polish (round 5): per-band blend
            # toward the observed-fit C with a closed-form guarantee
            # that no completion-witnessed peak renders below
            # polish_gamma x its anchored value — recovers
            # inversion-class SRE at low rho WITHOUT the unconstrained
            # polish's detection give-back
            # (solvers/completion.peak_gated_blend).
            from quantized_spectrum_cartography_tpu.solvers.completion \
                import gated_polish_c
            C_hat = gated_polish_c(S_hat, C_hat, T_obs, W[None], T_comp,
                                   num_peaks=R + polish_peaks_extra,
                                   ridge_rel=polish_ridge,
                                   gamma=polish_gamma,
                                   protect_floor=polish_floor,
                                   mode=polish_mode)
        else:
            # unconstrained observed-entry polish with a ridge toward
            # the anchored C (solvers/completion._polish_c_to_observed).
            # Measured at rho=1%: recovers SRE (2.77 -> 1.4 for
            # DowJons) but trades back the detection win (miss
            # 0.30 -> 0.44) — the anchored amplitudes ARE the
            # detection-correct ones; prefer the gated variant above.
            from quantized_spectrum_cartography_tpu.solvers.completion \
                import _polish_c_to_observed
            C_hat = _polish_c_to_observed(S_hat, C_hat, T_obs, W[None],
                                          ridge_rel=polish_ridge)

    T_hat = get_tensor(S_hat, C_hat)
    zero = jnp.zeros((1,), jnp.float32)
    return RecoveryResult(S=S_hat, C=C_hat, T_hat=T_hat,
                          nmses=zero, costs=zero,
                          aux={"S_spa": S0, "C_spa": C0})
