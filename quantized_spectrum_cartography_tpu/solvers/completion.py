"""Unquantized masked-completion solvers (the pre-quantization toolchain).

Re-designs of:
- `deep_prior/optimization.ipynb` cells 17/19  run_descent — GAN/AE prior
  completion of one masked SLF: 400+200 randomized z draws on masked MSE
  then Adam on z (the prior-quality benchmark protocol, sweeping f);
- `backup/algorithms/nn_descent_gan.py:49-183`  optimize_z/optimize_z_raw —
  the MATLAB-callable multi-emitter latent descent on masked MSE;
- the MATLAB harness's DowJons proper (`joint_opt_ae.m:403-465`):
  alternating exact NNLS C-steps (lsqnonneg per frequency) with latent
  S-steps on the masked unquantized tensor.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from quantized_spectrum_cartography_tpu.baselines.nnls import (
    nnls_gram,
    nnls_rows,
)
from quantized_spectrum_cartography_tpu.ops.lowrank import get_tensor
from quantized_spectrum_cartography_tpu.ops.metrics import nmse
from quantized_spectrum_cartography_tpu.solvers.base import RecoveryResult
from quantized_spectrum_cartography_tpu.solvers.gan_inversion import (
    _adam_descent,
)
from quantized_spectrum_cartography_tpu.solvers.priors import (
    randomized_search,
)


def _polish_c_to_observed(
    S: jnp.ndarray,
    C_anchored: jnp.ndarray,
    T_obs: jnp.ndarray,
    W: jnp.ndarray,
    ridge_rel: float = 0.1,
    nnls_iters: int = 200,
) -> jnp.ndarray:
    """Final amplitude polish after an anchored solve: per-band NNLS on
    the OBSERVED entries with a Tikhonov ridge toward the anchored C.

    The completion anchor fixes the catastrophic lost-emitter mode but
    also imprints the completion's amplitude error on C (measured: SRE
    0.91 -> 2.77 at rho=1% while miss 0.47 -> 0.30).  Observed-only
    refitting alone would reintroduce the ill-conditioned design that
    zeroes an emitter; the ridge (relative weight `ridge_rel` of the
    observed design's mean diagonal energy) pins unidentifiable
    directions at their anchored values while identifiable amplitudes
    snap to the real samples.  S [R,I,J], C_anchored [R,K], W [1,I,J].
    Returns polished C [R,K]."""
    R = S.shape[0]
    K = T_obs.shape[0]
    S_obs = S.reshape(R, -1) * W.reshape(1, -1)            # [R, IJ]
    G = jnp.matmul(S_obs, S_obs.T)
    lam = ridge_rel * jnp.trace(G) / R
    sq = jnp.sqrt(jnp.maximum(lam, 1e-20))
    A_aug = jnp.concatenate([S_obs.T, sq * jnp.eye(R, dtype=S.dtype)])
    B_aug = jnp.concatenate(
        [(T_obs * W).reshape(K, -1), sq * C_anchored.T], axis=1)
    return nnls_rows(A_aug, B_aug, iters=nnls_iters).T


def peak_gated_blend(
    S: jnp.ndarray,
    C_anch: jnp.ndarray,
    C_pol: jnp.ndarray,
    peaks_yx: jnp.ndarray,
    gamma: float = 0.8,
    protect_floor: float = 0.0,
) -> jnp.ndarray:
    """Per-band blend of the anchored and observed-polished C factors
    with a closed-form peak-protection guarantee (the round-4 VERDICT's
    low-rho frontier: the unconstrained polish recovers SRE 2.77 -> 1.4
    at rho=1% but trades miss 0.30 -> 0.44 because the ridge pulls ALL
    bands, including witnessed emitter peaks).

    For band k the blended column is C_b = a_k*C_pol + (1-a_k)*C_anch,
    and by linearity the rendered value at any location p is
    a_k*v_pol[k,p] + (1-a_k)*v_anch[k,p].  Choosing

        a_k = min over protected peaks p of
              1                                if v_pol >= gamma*v_anch
              (1-gamma)*v_anch/(v_anch-v_pol)  otherwise

    guarantees the blend never renders below gamma x the anchored value
    at any witnessed peak (the amplitudes that hold miss parity), while
    bands whose polished column keeps the peaks — the vast majority;
    the polish only collapses amplitudes where the observed design is
    blind — snap fully to the real samples.  This recovers SRE and
    *reduces* false alarms (observed data pulls inactive-band
    amplitudes to ~0) without giving back detection.

    S [R, I, J]; C_* [R, K]; peaks_yx [P, 2] int (y, x) witness peaks
    (solvers/nasdac.witness_peaks).  Returns blended C [R, K].

    `protect_floor`: a (band, peak) pair is only protected when the
    anchored render exceeds this absolute level.  Hypothesis was that
    renders near the 0.01 event threshold save no misses but keep false
    events; MEASUREMENT REFUTED IT (GATED_POLISH_DIAG3.json): small
    anchored renders protect the numerous small-ref peak events (ref in
    (0.01, 4*v_anch)), so a 0.02 floor traded miss 0.238 -> 0.270 for
    false 0.054 -> 0.042 at rho=1% — strictly dominated by just lowering
    gamma (gamma=0.6 reaches miss 0.266 / false 0.040 at BETTER SRE).
    Default 0 (off); kept as an experiment knob with this record.
    """
    s_at = S[:, peaks_yx[:, 0], peaks_yx[:, 1]]        # [R, P]
    v_anch = jnp.einsum("rp,rk->kp", s_at, C_anch)     # [K, P]
    v_pol = jnp.einsum("rp,rk->kp", s_at, C_pol)
    need = (v_pol < gamma * v_anch) & (v_anch > protect_floor)
    a = jnp.where(
        need,
        (1.0 - gamma) * v_anch / jnp.maximum(v_anch - v_pol, 1e-12),
        1.0)
    a_k = jnp.clip(jnp.min(a, axis=1), 0.0, 1.0)       # [K]
    return a_k[None, :] * C_pol + (1.0 - a_k)[None, :] * C_anch


def _constrained_polish_c(
    S: jnp.ndarray,
    C_anch: jnp.ndarray,
    T_obs: jnp.ndarray,
    W: jnp.ndarray,
    peaks_yx: jnp.ndarray,
    gamma: float = 0.75,
    ridge_rel: float = 0.1,
    beta_rel: float = 10.0,
    rounds: int = 3,
    nnls_iters: int = 200,
) -> jnp.ndarray:
    """Per-band peak-CONSTRAINED observed-entry polish (round 5+).

    Solves, for every band k,

        min_{c >= 0}  || diag(w_obs) (S_obs^T c - t_k) ||^2
                      + lam || c - c_anch,k ||^2
        s.t.          s(p) . c  >=  gamma * v_anch[k, p]   for all
                                    witnessed peaks p

    by an iterated quadratic penalty in Gram space: each round solves a
    vmapped per-band NNLS whose normal equations add beta * s_p s_p^T /
    beta * (gamma v_anch) s_p for the ACCUMULATED active set — every
    constraint any previous iterate violated stays penalized (the
    standard iterated-penalty scheme; recomputing the set from scratch
    each round can oscillate, re-violating a constraint whose penalty
    was dropped).  Constraints never violated never drag the fit.
    `peak_gated_blend` restricts the polish to the single line segment
    [C_anch -> C_pol]; this searches the full feasible set, so at equal
    protection it is weakly better on the TOTAL objective (observed
    residual + ridge) by construction — the blend point is feasible for
    this program.  (Not necessarily on the observed residual alone: the
    QP may trade a smaller ridge term for slightly more residual.)  Any
    residual sub-gamma violation from penalty softness is closed
    exactly by a final `peak_gated_blend` against C_anch in the caller
    (`gated_polish_c(mode='qp')`).

    MEASURED END-TO-END (GATED_POLISH_DIAG5.json, 50 examples x rho in
    {1, 2.5}%): despite a decisively better observed-entry residual
    (3.2x lower on a synthetic check), the full harness lands at values
    IDENTICAL to the blend at equal gamma — Nasdac rho=1% SRE 0.8428 vs
    0.8425, miss 0.2511 vs 0.2498, false 0.0551 vs 0.0548; DowJons the
    same within +-0.015 SRE / 0.003 miss.  Raising gamma under the QP
    (0.85/0.9) trades along the SAME frontier the blend's gamma sweep
    mapped (miss 0.2318/0.2228 at SRE 0.95/1.03 and false 0.063/0.073 —
    the false criterion fails there).  Conclusion: the one-dimensional
    blend already extracts everything ~26 observed samples can say
    about the amplitudes; the residual ~2.1x gap to the oracle-C floor
    (LOWRHO_SRE_FLOOR.json) is information-limited, not
    optimization-limited.  The mode stays available (and tested) for
    deployments with denser observations, where the feasible set is
    larger.

    S [R, I, J]; C_anch [R, K]; T_obs [K, I, J]; W [1, I, J] binary;
    peaks_yx [P, 2] int.  beta_rel scales the penalty against the
    observed design's mean diagonal energy (same normalization as
    `ridge_rel`).  Returns C [R, K].
    """
    R = S.shape[0]
    K = T_obs.shape[0]
    S_obs = S.reshape(R, -1) * W.reshape(1, -1)            # [R, IJ]
    G = jnp.matmul(S_obs, S_obs.T)                         # [R, R]
    scale = jnp.trace(G) / R
    lam = ridge_rel * scale
    beta = beta_rel * scale
    AtB0 = (jnp.matmul(S_obs, (T_obs * W).reshape(K, -1).T)
            + lam * C_anch)                                # [R, K]
    AtA0 = G + lam * jnp.eye(R, dtype=S.dtype)

    s_at = S[:, peaks_yx[:, 0], peaks_yx[:, 1]]            # [R, P]
    v_anch = jnp.einsum("rp,rk->kp", s_at, C_anch)         # [K, P]
    target = gamma * v_anch                                # [K, P]

    def solve(active):
        # active [K, P] in {0,1}: per-band penalty masks
        AtA = (AtA0[None]
               + beta * jnp.einsum("kp,rp,sp->krs", active, s_at, s_at))
        AtB = AtB0.T + beta * jnp.einsum("kp,kp,rp->kr", active, target,
                                         s_at)             # [K, R]
        return jax.vmap(
            lambda M, b: nnls_gram(M, b[:, None], nnls_iters)[:, 0]
        )(AtA, AtB).T                                      # [R, K]

    def one_round(carry, _):
        C, active = carry
        v = jnp.einsum("rp,rk->kp", s_at, C)               # [K, P]
        active = jnp.maximum(active,
                             (v < target - 1e-9).astype(S.dtype))
        return (solve(active), active), None

    C0 = solve(jnp.zeros_like(target))        # unconstrained ridge NNLS
    (C, _), _ = jax.lax.scan(one_round, (C0, jnp.zeros_like(target)),
                             None, length=rounds)
    return C


def gated_polish_c(
    S: jnp.ndarray,
    C_anch: jnp.ndarray,
    T_obs: jnp.ndarray,
    W: jnp.ndarray,
    T_wit: jnp.ndarray,
    num_peaks: int,
    ridge_rel: float = 0.1,
    gamma: float = 0.8,
    protect_floor: float = 0.0,
    nnls_iters: int = 200,
    mode: str = "blend",
) -> jnp.ndarray:
    """Observed-entry C polish gated by completion-witnessed peaks at the
    greedy NMS peaks of the witness `T_wit` (solvers/nasdac.witness_peaks).

    mode='blend' (default): `_polish_c_to_observed` then
    `peak_gated_blend` — one scalar per band along the segment
    [C_anch -> C_pol].  mode='qp': `_constrained_polish_c` — the full
    per-band inequality-constrained ridge NNLS (weakly better observed
    fit at equal peak protection); the final blend stays on as the
    exact feasibility guarantee and is ~identity when the penalty
    already holds the constraints."""
    from quantized_spectrum_cartography_tpu.solvers.nasdac import (
        witness_peaks)
    pts = witness_peaks(T_wit, num_peaks)
    if mode == "qp":
        C_pol = _constrained_polish_c(S, C_anch, T_obs, W, pts,
                                      gamma=gamma, ridge_rel=ridge_rel,
                                      nnls_iters=nnls_iters)
    elif mode == "blend":
        C_pol = _polish_c_to_observed(S, C_anch, T_obs, W,
                                      ridge_rel=ridge_rel,
                                      nnls_iters=nnls_iters)
    else:
        # a typo'd mode silently running the default would poison any
        # A/B built on this knob
        raise ValueError(f"unknown polish mode {mode!r} "
                         "(expected 'blend' or 'qp')")
    return peak_gated_blend(S, C_anch, C_pol, pts, gamma=gamma,
                            protect_floor=protect_floor)


def residual_peak_refine(
    T_hat: jnp.ndarray,
    T_obs: jnp.ndarray,
    W: jnp.ndarray,
    num_patches: int = 2,
    d0: float = 2.0,
    alpha: float = 2.25,
) -> jnp.ndarray:
    """Observed-residual local peak refinement (ground-truth-free).

    The residual catastrophic miss mode after anchoring is EDGE emitters:
    conv priors (VAE decoder and completion AE alike) underestimate peaks
    at the grid boundary 2-3x, so both the factored estimate and its
    completion witness render the emitter low while nearby OBSERVED
    samples carry the true amplitude (measured at rho=7.5%: all DowJons
    misses came from 2 examples with peaks at y<=2, nearest observation
    3-5 px, completion at 0.3-0.45x truth).  The data itself is the only
    honest witness there, so: `num_patches` times, (1) find the largest
    positive masked residual, (2) drop a mean-path-loss bump
    min(1,(d/d0)^-alpha) — the simulator's own kernel shape at the mean
    alpha, generate_map.m:90-113 — centered on it, (3) fit one
    nonnegative per-band amplitude to the observed residuals under the
    bump in closed form, and add the patch.  Where the model already
    fits, the fitted amplitudes are ~0 and the patch is a no-op.

    T_hat, T_obs [K, I, J]; W [I, J] or [1, I, J].  Returns refined
    T_hat (factors are NOT updated — this is a tensor-level correction).
    """
    K, I, J = T_obs.shape
    Wb = jnp.broadcast_to(W.reshape(-1, I, J)[:1], (1, I, J))
    yy = jnp.arange(I, dtype=jnp.float32)[:, None]
    xx = jnp.arange(J, dtype=jnp.float32)[None, :]

    def one_patch(T_hat, _):
        resid = (T_obs - T_hat) * Wb                      # [K, I, J]
        Rmap = jnp.sum(jnp.maximum(resid, 0.0), axis=0)   # [I, J]
        idx = jnp.argmax(Rmap)
        cy = (idx // J).astype(jnp.float32)
        cx = (idx % J).astype(jnp.float32)
        d = jnp.sqrt(jnp.square(yy - cy) + jnp.square(xx - cx))
        bump = jnp.minimum(1.0, (jnp.maximum(d, 1e-6) / d0) ** -alpha)
        den = jnp.sum(Wb[0] * bump * bump)
        num = jnp.sum(Wb * bump[None] * resid, axis=(1, 2))   # [K]
        a = jnp.maximum(num / jnp.maximum(den, 1e-12), 0.0)
        return T_hat + a[:, None, None] * bump[None], None

    T_hat, _ = jax.lax.scan(one_patch, T_hat, None, length=num_patches)
    return T_hat


def recover_masked_mse(
    key: jax.Array,
    gen_apply: Callable[[jnp.ndarray], jnp.ndarray],
    mask: jnp.ndarray,
    observed: jnp.ndarray,
    z_dim: int = 256,
    num_emitters: int = 1,
    num_global: int = 400,
    num_local: int = 200,
    adam_steps: int = 500,
    lr: float = 0.01,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Masked-MSE prior completion of SLF(s) (optimization.ipynb cell 17).

    mask/observed: [I, J] (single SLF) or summed-map target per emitter
    stack [R, I, J].  Returns (S_hat, z, losses)."""

    def loss_of(S):
        return jnp.sum(mask * jnp.square(S - observed)) / jnp.maximum(
            jnp.sum(mask), 1.0)

    k0, ks = jax.random.split(key)
    z0 = jax.random.normal(k0, (num_emitters, z_dim))
    z = randomized_search(
        ks, gen_apply, lambda S: loss_of(S if num_emitters > 1 else S[0]),
        z0, num_global, num_local)
    z, losses = _adam_descent(
        lambda zz: loss_of(gen_apply(zz) if num_emitters > 1
                           else gen_apply(zz)[0]),
        z, lr, adam_steps)
    S = gen_apply(z)
    return (S if num_emitters > 1 else S[0]), z, losses


def optimize_z(
    key: jax.Array,
    gen_apply: Callable[[jnp.ndarray], jnp.ndarray],
    S_targets: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    z_init: Optional[jnp.ndarray] = None,
    adam_steps: int = 200,
    lr: float = 0.01,
    z_dim: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multi-emitter latent descent to target SLFs [R, I, J] on (masked)
    MSE — the MATLAB-callable S-step (nn_descent_gan.py optimize_z_raw).
    Returns (S_hat [R, I, J], z)."""
    R = S_targets.shape[0]
    zd = z_init.shape[-1] if z_init is not None else z_dim
    z0 = (z_init if z_init is not None
          else jax.random.normal(key, (R, zd)))
    m = jnp.ones_like(S_targets) if mask is None else mask

    def loss(zz):
        return jnp.sum(m * jnp.square(gen_apply(zz) - S_targets)) / \
            jnp.maximum(jnp.sum(m), 1.0)

    z, _ = _adam_descent(loss, z0, lr, adam_steps)
    return gen_apply(z), z


def recover_dowjons_unquantized(
    key: jax.Array,
    T_obs: jnp.ndarray,
    Om: jnp.ndarray,
    gen_apply: Callable[[jnp.ndarray], jnp.ndarray],
    num_emitters: int = 2,
    z_dim: int = 256,
    outer_iters: int = 20,
    z_steps_per_iter: int = 20,
    nnls_iters: int = 100,
    lr_z: float = 0.01,
    T_true: Optional[jnp.ndarray] = None,
    S_init: Optional[jnp.ndarray] = None,
    init_steps: int = 150,
    n_restarts: int = 1,
    S_init_dense: bool = False,
    T_anchor: Optional[jnp.ndarray] = None,
    anchor_mu0: float = 0.3,
    anchor_rho0: float = 0.05,
    polish_ridge: float = 0.0,
) -> RecoveryResult:
    """The harness's DowJons joint optimization on unquantized samples:

      Z-init: when `S_init` [R, I, J] is given (the SPA factor estimate),
              restart 0 starts Z from a latent fit to it — the reference
              seeds its joint optimization from the SPA/NMF stage the
              same way (`joint_opt_ae.m:301-317` passes S_py into
              nn_descent's init, which AE-completes it and returns the
              latent), which is what keeps it from losing an emitter to
              a bad random draw.  `S_init_dense=True` marks S_init as a
              dense (already-completed) SLF estimate — the fit then uses
              every pixel, matching the reference's completed-S init;
              otherwise only observed entries are fit;
      restarts: `n_restarts` independent runs (restart 0 SPA-seeded,
              the rest fresh random Z), winner by final masked data fit
              — the nonconvex inversion's rare total failures (an
              emitter never found) dominate the miss-detection tail,
              and restart selection needs no ground truth;
      C-step: exact NNLS per frequency on observed locations
              (lsqnonneg loop at joint_opt_ae.m:403-418 -> one batched
              Nesterov NNLS over all K rows)
      S-step: latent Adam descent through the frozen generator on the
              masked residual (joint_opt_ae.m:444-465)

    T_obs [K, I, J] with per-location mask Om [I, J].

    `T_anchor` (a dense per-band AE completion of the observations)
    enables the low-rho completion anchor: unobserved entries join the
    objective at weight `anchor_weight(Om, anchor_mu0)` (see
    solvers/nasdac.anchor_weight for the measured failure mode — the
    amplitude fit zeroing an emitter whose support the samples missed —
    and the decay schedule; zero above 5% sampling, so the behavior at
    the published-SRE condition is unchanged).  The anchor enters ONE
    objective shared by the C-step NNLS, the latent descent, and the
    restart selection — anchoring only the C-step was measured to
    destabilize the alternation (C pulled toward the completion while Z
    fit the raw samples: miss 0.13 -> 0.27 at rho=2.5%).
    """
    K, I, J = T_obs.shape
    R = num_emitters
    W = Om.astype(T_obs.dtype)[None]               # [1, I, J] broadcast
    if T_anchor is not None:
        from quantized_spectrum_cartography_tpu.solvers.nasdac import (
            anchor_weight)
        mu = anchor_weight(W, anchor_mu0, anchor_rho0)
        Wc = W + mu * (1.0 - W)                    # [1, I, J]
        T_fit = T_obs * W + T_anchor * (1.0 - W)
    else:
        Wc = W
        T_fit = T_obs * W
    Wf = jnp.sqrt(Wc).reshape(1, -1)               # [1, IJ]
    T_flat = T_fit.reshape(K, -1) * Wf             # [K, IJ]

    track = T_true is not None
    T_ref = T_true if track else jnp.zeros_like(T_obs)

    opt = optax.adam(lr_z)

    def c_step(S):
        # rows: min_{c_k>=0} || diag(w) (S_flat^T c_k - t_k) ||
        S_masked = (S.reshape(R, -1) * Wf)         # [R, IJ] weighted design
        return nnls_rows(S_masked.T, T_flat, iters=nnls_iters)  # [K, R]

    def z_loss(Z, C):
        T_hat = get_tensor(gen_apply(Z), C)
        return jnp.sum(Wc * jnp.square(T_hat - T_fit))

    # SPA-seeded latent fit — computed ONCE, outside the restart vmap
    # (every lane used to pay the init_steps generator evaluations only
    # to discard them in all lanes but restart 0).
    if S_init is not None:
        # Raw SPA columns only carry information at observed entries
        # (fit there); a dense completed estimate is fit everywhere.
        # The fit is scale-invariant — closed-form per-emitter gain
        # a* = <G,t>/<G,G> inside the loss — so it works for any
        # generator amplitude convention (the VAE prior emits
        # SLF-amplitude maps, solvers/vae_prior.py DEFAULT_AMP; C
        # absorbs all amplitude in the alternation anyway).
        fit_region = jnp.broadcast_to(
            jnp.ones_like(W) if S_init_dense else W, S_init.shape)

        def init_loss(zz):
            Gm = gen_apply(zz)                    # [R, I, J]
            num = jnp.sum(fit_region * Gm * S_init, axis=(1, 2),
                          keepdims=True)
            den = jnp.sum(fit_region * Gm * Gm, axis=(1, 2),
                          keepdims=True)
            a = num / jnp.maximum(den, 1e-12)
            return jnp.sum(fit_region *
                           jnp.square(a * Gm - S_init))

        Z_fit, _ = _adam_descent(
            init_loss,
            jax.random.normal(jax.random.fold_in(key, 17), (R, z_dim)),
            lr_z, init_steps)
    else:
        Z_fit = None

    def single(kz, use_spa):
        Z = jax.random.normal(kz, (R, z_dim))
        if Z_fit is not None:
            Z = jnp.where(use_spa, Z_fit, Z)

        def outer(carry, _):
            Z, opt_state = carry
            S = gen_apply(Z)
            C = c_step(S).T                        # [R, K]

            def zs(carry2, _):
                Z, st = carry2
                loss, g = jax.value_and_grad(z_loss)(Z, C)
                up, st = opt.update(g, st, Z)
                return (optax.apply_updates(Z, up), st), loss

            (Z, opt_state), losses = jax.lax.scan(
                zs, (Z, opt_state), None, length=z_steps_per_iter)
            err = (nmse(get_tensor(gen_apply(Z), C), T_ref) if track
                   else jnp.float32(0.0))
            return (Z, opt_state), (losses[-1], err)

        (Z, _), (costs, nmses) = jax.lax.scan(
            outer, (Z, opt.init(Z)), None, length=outer_iters)
        S = gen_apply(Z)
        C = c_step(S).T
        final_cost = z_loss(Z, C)
        return S, C, costs, nmses, Z, final_cost

    if n_restarts <= 1:
        S, C, costs, nmses, Z, _ = single(key, jnp.bool_(True))
    else:
        keys = jax.random.split(key, n_restarts)
        use_spa = jnp.arange(n_restarts) == 0
        Ss, Cs, costss, nmsess, Zs, fits = jax.vmap(single)(keys, use_spa)
        b = jnp.argmin(fits)
        S, C, costs, nmses, Z = (Ss[b], Cs[b], costss[b], nmsess[b],
                                 Zs[b])
    if T_anchor is not None and polish_ridge > 0.0:
        C = _polish_c_to_observed(S, C, T_obs, W,
                                  ridge_rel=polish_ridge)
    return RecoveryResult(S=S, C=C, T_hat=get_tensor(S, C),
                          nmses=nmses, costs=costs, aux={"Z": Z})


def run_descent_ae(
    ae_input_apply: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    C: jnp.ndarray,
    T_obs: jnp.ndarray,
    W: jnp.ndarray,
    lr: float = 0.01,
    max_iters: int = 10,
    min_iters: int = 5,
    tol: float = 1e-5,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The AE-latent S-step with the reference's early-stop semantics
    (`backup/algorithms/nn_descent_ae.py:72-142` run_descent): the
    optimized variable is the frozen completion network's own INPUT
    (mask-channel ‖ map-channel, gradients flow into both), cost is the
    masked squared tensor residual at fixed C, Adam(lr=0.01), at most
    `loop_count`=10 iterations, and from the 6th iteration on the loop
    breaks BEFORE applying the step when the loss improvement drops below
    1e-5 (`:128-131` check-then-step order).

    TPU-native form: one `lax.while_loop` whose carry holds (x, Adam
    state, previous loss); the stop predicate reproduces check-then-step
    by evaluating value+grad at the top of the body and freezing x when
    the improvement test fires — no Python-level control flow, so the
    whole alternation jits.

    ae_input_apply: [R, I, J, 2] -> [R, I, J] completed SLFs.
    x0 [R, I, J, 2]; C [R, K]; T_obs/W broadcastable [K, I, J].
    Returns (x, S_hat [R, I, J], iterations_used, final_loss).
    """
    opt = optax.adam(lr)

    def cost_of(x):
        return jnp.sum(jnp.square(W * (get_tensor(ae_input_apply(x), C)
                                       - T_obs)))

    prev0 = cost_of(x0)

    def cond(c):
        x, st, prev, i, stop = c
        return jnp.logical_and(i < max_iters, jnp.logical_not(stop))

    def body(c):
        x, st, prev, i, stop = c
        loss, g = jax.value_and_grad(cost_of)(x)
        # reference `:128`: if i>5 and previous_loss - loss < 1e-5: break
        hit = jnp.logical_and(i >= min_iters, prev - loss < tol)
        up, st2 = opt.update(g, st, x)
        x2 = jax.tree.map(lambda a, b: jnp.where(hit, a, b),
                          x, optax.apply_updates(x, up))
        st2 = jax.tree.map(lambda a, b: jnp.where(hit, a, b), st, st2)
        return (x2, st2, loss, i + 1, hit)

    x, _, final_loss, iters, _ = jax.lax.while_loop(
        cond, body, (x0, opt.init(x0), prev0, jnp.int32(0),
                     jnp.bool_(False)))
    return x, ae_input_apply(x), iters, final_loss


def recover_dowjons_ae_latent(
    T_obs: jnp.ndarray,
    Om: jnp.ndarray,
    ae_encode: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    ae_decode: Callable[[jnp.ndarray], jnp.ndarray],
    num_emitters: int = 2,
    outer_iters: int = 10,
    z_steps: int = 10,
    lr: float = 0.01,
    lambda_z: float = 1e-5,
    nnls_iters: int = 100,
    S_init: Optional[jnp.ndarray] = None,
    T_true: Optional[jnp.ndarray] = None,
    normalize_init: bool = True,
    T_anchor: Optional[jnp.ndarray] = None,
    anchor_mu0: float = 0.3,
    anchor_rho0: float = 0.05,
    polish_ridge: float = 0.0,
) -> RecoveryResult:
    """DowJons exactly as the reference's committed configuration runs it
    (`joint_opt_ae.m:29` use_gan=false):

      init:   SPA factors (`:213-246`) -> AE-encode the (mask ‖ masked
              SPA SLF) stack -> latent z0 (`model_ae` returns
              `autoencoder.encoder(test_slf)`, nn_descent_ae.py:195-201);
      C-step: exact NNLS per frequency over observed locations
              (lsqnonneg loop `:403-418`, lambda=0 in the committed file);
      S-step: `run_descent_ae` (nn_descent_ae.py:253-322) — z_steps=10
              Adam(lr=0.01) steps on the AE **latent** through the frozen
              `autoencoder.decoder`, cost = masked squared tensor residual
              + 1e-5·‖z‖_F, early stop commented out in the reference.

    The latent bottleneck keeps every S iterate on the completion-AE
    manifold — unlike raw latent-free inversion, an emitter can't be
    "lost" to an off-manifold fit at very sparse sampling, which is what
    dominates the low-rho miss-detection tail.

    `normalize_init`: SPA pushes C column norms into S, so the SPA SLF
    estimate arrives at arbitrary amplitude while the AE is trained on
    Frobenius-normalized SLFs (RMS 1/51); rescale each emitter's observed
    entries to that RMS before encoding (the C-step re-absorbs all
    amplitude immediately, so this is free).
    """
    K, I, J = T_obs.shape
    R = num_emitters
    W1 = Om.astype(T_obs.dtype)                    # [I, J]
    W = W1[None]
    T_flat = (T_obs * W).reshape(K, -1)

    if S_init is None:
        from quantized_spectrum_cartography_tpu.baselines.spa import nmf_spa
        _, S_flat = nmf_spa(T_flat, R)
        S_init = S_flat.reshape(R, I, J)

    # completion anchor at low rho — ONE objective shared by the C-step,
    # the latent descent, and (trivially, single start) the final fit
    # (see recover_dowjons_unquantized: anchoring only the C-step was
    # measured to destabilize the alternation)
    if T_anchor is not None:
        from quantized_spectrum_cartography_tpu.solvers.nasdac import (
            anchor_weight)
        mu = anchor_weight(W, anchor_mu0, anchor_rho0)
        Wc = W + mu * (1.0 - W)
        T_fit = T_obs * W + T_anchor * (1.0 - W)
    else:
        Wc = W
        T_fit = T_obs * W
    Wf = jnp.sqrt(Wc).reshape(1, -1)
    T_flat = T_fit.reshape(K, -1) * Wf

    if normalize_init:
        n_obs = jnp.maximum(jnp.sum(W1), 1.0)
        rms = jnp.sqrt(jnp.sum(jnp.square(S_init * W), axis=(1, 2),
                               keepdims=True) / n_obs)
        S_init = S_init * ((1.0 / I) / jnp.maximum(rms, 1e-12))

    z = ae_encode(W1, S_init)                      # [R, latent]

    def c_step(S):
        S_masked = S.reshape(R, -1) * Wf
        return nnls_rows(S_masked.T, T_flat, iters=nnls_iters).T   # [R, K]

    def z_cost(z, C):
        T_hat = get_tensor(ae_decode(z), C)
        return (jnp.sum(Wc * jnp.square(T_hat - T_fit))
                + lambda_z * jnp.sqrt(jnp.sum(jnp.square(z)) + 1e-12))

    opt = optax.adam(lr)
    track = T_true is not None
    T_ref = T_true if track else jnp.zeros_like(T_obs)

    def outer(carry, _):
        z, opt_state = carry
        C = c_step(ae_decode(z))

        def zs(c2, _):
            z, st = c2
            loss, g = jax.value_and_grad(z_cost)(z, C)
            up, st = opt.update(g, st, z)
            return (optax.apply_updates(z, up), st), loss

        (z, opt_state), losses = jax.lax.scan(
            zs, (z, opt_state), None, length=z_steps)
        err = (nmse(get_tensor(ae_decode(z), C), T_ref) if track
               else jnp.float32(0.0))
        return (z, opt_state), (losses[-1], err)

    (z, _), (costs, nmses) = jax.lax.scan(
        outer, (z, opt.init(z)), None, length=outer_iters)
    S = ae_decode(z)
    C = c_step(S)
    if T_anchor is not None and polish_ridge > 0.0:
        C = _polish_c_to_observed(S, C, T_obs, W,
                                  ridge_rel=polish_ridge)
    return RecoveryResult(S=S, C=C, T_hat=get_tensor(S, C),
                          nmses=nmses, costs=costs, aux={"z": z})


def recover_dowjons_ae(
    T_obs: jnp.ndarray,
    Om: jnp.ndarray,
    ae_input_apply: Callable[[jnp.ndarray], jnp.ndarray],
    num_emitters: int = 2,
    outer_iters: int = 10,
    nnls_iters: int = 100,
    lr: float = 0.01,
    scale: float = 50.0,
    S_init: Optional[jnp.ndarray] = None,
    T_true: Optional[jnp.ndarray] = None,
) -> RecoveryResult:
    """DowJons with the AE S-step (`joint_opt_ae.m:444-465` chooses between
    the GAN `optimize_z_raw` and the AE `run_descent` each outer
    iteration; this is the AE variant; `recover_dowjons_unquantized` is
    the GAN one).  C-step: exact NNLS per frequency row over observed
    locations (`:403-418`).  S-step: `run_descent_ae`, feeding the
    network-input estimate back across outer iterations the way the
    MATLAB driver round-trips `test_slf` through py.run_descent.

    Seeded by SPA (`:213-246`) unless S_init is given.
    """
    from quantized_spectrum_cartography_tpu.baselines.spa import nmf_spa

    K, I, J = T_obs.shape
    R = num_emitters
    W1 = Om.astype(T_obs.dtype)                    # [I, J]
    W = W1[None]                                   # [1, I, J]
    Wf = W1.reshape(1, -1)
    T_flat = (T_obs * W).reshape(K, -1)

    if S_init is None:
        _, S_flat = nmf_spa(T_flat, R)
        S_init = S_flat.reshape(R, I, J)

    # network-input estimate: mask channel ‖ scaled map channel
    x = jnp.stack([jnp.broadcast_to(W1, (R, I, J)), S_init * scale], -1)

    def c_step(S):
        S_masked = S.reshape(R, -1) * Wf
        return nnls_rows(S_masked.T, T_flat, iters=nnls_iters).T   # [R, K]

    track = T_true is not None
    T_ref = T_true if track else jnp.zeros_like(T_obs)

    def outer(carry, _):
        x, _ = carry
        C = c_step(ae_input_apply(x))
        x, S, _, loss = run_descent_ae(ae_input_apply, x, C, T_obs, W,
                                       lr=lr)
        err = nmse(get_tensor(S, C), T_ref) if track else jnp.float32(0.0)
        return (x, loss), (loss, err)

    (x, _), (costs, nmses) = jax.lax.scan(
        outer, (x, jnp.float32(0.0)), None, length=outer_iters)
    S = ae_input_apply(x)
    C = c_step(S)
    return RecoveryResult(S=S, C=C, T_hat=get_tensor(S, C),
                          nmses=nmses, costs=costs, aux={"x": x})
