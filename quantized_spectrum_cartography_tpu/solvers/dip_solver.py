"""Deep-image-prior recovery: optimize untrained decoder weights per map.

The reference's DIP driver is lost (`qmc/dip.py` is empty, `qmc/dip.ipynb`
stripped — .MISSING_LARGE_BLOBS:5); only the `DecoderDip` architecture
survives (deep_prior/networks/dip.py:20-89).  This solver implements the
standard DIP protocol on that architecture: fixed random z, Adam on the
decoder parameters against the observed (masked, possibly 1-bit) data.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from quantized_spectrum_cartography_tpu.models.dip import DecoderDip
from quantized_spectrum_cartography_tpu.ops.likelihood import neg_likelihood_1bit
from quantized_spectrum_cartography_tpu.ops.metrics import nmse as nmse_metric


def recover_dip(
    key: jax.Array,
    y_obs: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    mean: float = 0.0,
    std: Optional[float] = None,
    onebit: bool = True,
    steps: int = 1000,
    lr: float = 0.001,
    z_dim: int = 256,
    slf_true: Optional[jnp.ndarray] = None,
):
    """Recover one SLF [I, J] from observations y_obs.

    onebit=True: y_obs in {0,1}, probit BCE likelihood (std required);
    onebit=False: masked MSE completion.
    Returns (S_hat [I, J], losses [steps], nmses [steps]).
    """
    model = DecoderDip(z_dim=z_dim)
    kz, kp = jax.random.split(key)
    z = jax.random.normal(kz, (1, z_dim))
    variables = model.init(kp, z, train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]

    track = slf_true is not None
    S_ref = slf_true if track else jnp.zeros(y_obs.shape, jnp.float32)

    def forward(params, batch_stats):
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats}, z, train=True,
            mutable=["batch_stats"])
        return out[0, :, :, 0], mut["batch_stats"]

    def loss_fn(params, batch_stats):
        S, bs = forward(params, batch_stats)
        if onebit:
            l = neg_likelihood_1bit(S, y_obs, mean, std, probit=True, mask=mask)
        else:
            m = jnp.ones_like(y_obs) if mask is None else mask
            l = jnp.sum(m * jnp.square(S - y_obs)) / jnp.maximum(jnp.sum(m), 1.0)
        return l, bs

    opt = optax.adam(lr)

    def step(carry, _):
        params, bs, s = carry
        (loss, bs), g = jax.value_and_grad(loss_fn, has_aux=True)(params, bs)
        u, s = opt.update(g, s, params)
        params = optax.apply_updates(params, u)
        err = (nmse_metric(forward(params, bs)[0], S_ref) if track
               else jnp.float32(0.0))
        return (params, bs, s), (loss, err)

    (params, batch_stats, _), (losses, nmses) = jax.lax.scan(
        step, (params, batch_stats, opt.init(params)), None, length=steps)
    S_hat, _ = forward(params, batch_stats)
    return S_hat, losses, nmses


def recover_dip_tensor(
    key: jax.Array,
    T_obs: jnp.ndarray,          # [K, I, J] 1-bit observations in {0, 1}
    mean: float,
    std: float,
    num_emitters: int = 2,
    steps: int = 1000,
    lr: float = 0.001,
    z_dim: int = 256,
    T_true: Optional[jnp.ndarray] = None,
    holdout_frac: float = 0.05,
    l2_c: float = 0.01,
    val_ema_decay: float = 0.9,
    lr_schedule: str = "constant",
    out_ema_decay: float = 0.0,
    holdout_key: Optional[jax.Array] = None,
):
    """Full-tensor 1-bit recovery with DIP spatial priors: each emitter's
    SLF is an untrained `DecoderDip` instance (fixed z_r, Adam on its
    weights), C a free nonnegative PSD factor — the DIP-prior counterpart
    of the free-S low-rank MLE (`backup/notebooks/onebit_lowrank.ipynb`
    cell 1 protocol), directly comparable on the fixture floor.

    Early stopping: DIP overfits by construction (the decoder eventually
    fits the dither noise; the returned iterate can be 2-3x worse in
    NMSE than the best one passed on the way).  With `holdout_frac > 0`
    a random fraction of observed entries is excluded from the fit and
    scored every step; the returned factors are the iterate with the
    best EMA-SMOOTHED validation likelihood (`val_ema_decay`; the raw
    per-step val on ~8k held-out 1-bit entries is noisy enough that its
    pointwise argmin picked iterates ~0.05 NMSE worse than the smoothed
    one — round-4 VERDICT weakness 1) — the standard ground-truth-free
    DIP stopping rule.

    Reference anchors: architecture `deep_prior/networks/dip.py:20-89`;
    the lost driver `qmc/dip.py` (empty file).
    Returns (S_hat [R,I,J], C [R,K], losses, nmses, aux) with
    aux = {"holdout_best": smoothed validation NLL at the returned
    iterate (inf when holdout_frac == 0), "final_fit": last training
    loss} — `holdout_best` is the ground-truth-free restart-selection
    score (final training fit was measured non-discriminative:
    0.672±0.001 across all restarts, DIP_QUALITY.json round 4).
    """
    from quantized_spectrum_cartography_tpu.ops.lowrank import get_tensor

    R = num_emitters
    model = DecoderDip(z_dim=z_dim)
    key, kh = jax.random.split(key)
    # `holdout_key` pins the validation split independently of the
    # restart key: restart selection by holdout NLL compares means over
    # the SAME ~8k held-out entries (a per-restart random split was
    # measured confounded — cross-split sampling noise is comparable to
    # the between-restart signal, round-5 review finding)
    if holdout_key is not None:
        kh = holdout_key
    kz, kp, kc = jax.random.split(key, 3)
    if holdout_frac > 0.0:
        val_mask = jax.random.bernoulli(
            kh, holdout_frac, T_obs.shape).astype(jnp.float32)
        train_mask = 1.0 - val_mask
    else:
        val_mask = None
        train_mask = None
    zs = jax.random.normal(kz, (R, 1, z_dim))
    init_keys = jax.random.split(kp, R)
    variables = jax.vmap(
        lambda k, z: model.init(k, z, train=True))(init_keys, zs)
    params, batch_stats = variables["params"], variables["batch_stats"]
    C0 = 0.01 * jax.random.uniform(kc, (R, T_obs.shape[0]))

    track = T_true is not None
    T_ref = T_true if track else jnp.zeros_like(T_obs)

    def forward(params, batch_stats):
        def one(p, bs, z):
            out, mut = model.apply(
                {"params": p, "batch_stats": bs}, z, train=True,
                mutable=["batch_stats"])
            return out[0, :, :, 0], mut["batch_stats"]

        S, bs = jax.vmap(one)(params, batch_stats, zs)
        return S, bs

    def loss_fn(params, C, batch_stats):
        S, bs = forward(params, batch_stats)
        T_hat = get_tensor(S, C)
        # the saturating 1-bit likelihood is monotone in a global gain
        # once signs are confident — the same C-Frobenius penalty the
        # low-rank fixture protocol uses (fixture_parity.py L2=0.01)
        # pins the amplitude so late iterates don't drift
        from quantized_spectrum_cartography_tpu.ops.lowrank import safe_fro
        return (neg_likelihood_1bit(T_hat, T_obs, mean, std,
                                    probit=True, mask=train_mask)
                + l2_c * safe_fro(C)), bs

    # lr_schedule="cosine": decay lr -> lr/10 over the run.  DIP fits
    # coarse structure early and texture late; annealing lets the late
    # iterates settle instead of bouncing around the dither-noise basin
    # (the measured traj_last >> traj_best gap).
    if lr_schedule == "cosine":
        sched = optax.cosine_decay_schedule(lr, steps, alpha=0.1)
        opt = optax.adam(learning_rate=sched)
    else:
        opt = optax.adam(lr)

    def step(carry, _):
        params, C, bs, st, ema, t_ema, best = carry
        (loss, bs), g = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, C, bs)
        u, st = opt.update(g, st, (params, C))
        params, C = optax.apply_updates((params, C), u)
        C = jnp.maximum(C, 0.0)                     # nonneg projection
        S, _ = forward(params, bs)
        T_hat = get_tensor(S, C)
        if out_ema_decay > 0.0:
            # output EMA along the trajectory (standard DIP stabilizer):
            # the 1-bit validation NLL is measured nearly FLAT over the
            # run (0.687±0.001) — the saturating likelihood cannot rank
            # iterates whose NMSE differs by 0.1+ — so best-val stopping
            # loses ~0.06 NMSE to late-trajectory oscillation
            # (traj_last spikes to 0.96 vs traj_best 0.80,
            # tools/dip_lr_probe.py).  Averaging the reconstruction
            # suppresses the oscillation with no stopping signal at all.
            t_ema = jnp.where(jnp.isinf(t_ema[0, 0, 0]), T_hat,
                              out_ema_decay * t_ema
                              + (1.0 - out_ema_decay) * T_hat)
        err = (nmse_metric(T_hat, T_ref) if track else jnp.float32(0.0))
        if val_mask is not None:
            val = neg_likelihood_1bit(T_hat, T_obs, mean, std,
                                      probit=True, mask=val_mask)
            # EMA-smoothed validation curve (init at the first value)
            ema = jnp.where(jnp.isinf(ema), val,
                            val_ema_decay * ema
                            + (1.0 - val_ema_decay) * val)
            best_val, best_params, best_C, best_bs = best
            better = ema < best_val
            # batch_stats travel with the winning params so the restored
            # iterate is self-consistent even if an eval-mode forward
            # (use_running_average) is ever used downstream
            best = (jnp.where(better, ema, best_val),
                    jax.tree.map(lambda n, o: jnp.where(better, n, o),
                                 params, best_params),
                    jnp.where(better, C, best_C),
                    jax.tree.map(lambda n, o: jnp.where(better, n, o),
                                 bs, best_bs))
        return (params, C, bs, st, ema, t_ema, best), (loss, err)

    best0 = (jnp.float32(jnp.inf), params, C0, batch_stats)
    t_ema0 = jnp.full_like(T_obs, jnp.inf)
    (params, C, batch_stats, _, _, t_ema, best), (losses, nmses) = \
        jax.lax.scan(
            step, (params, C0, batch_stats, opt.init((params, C0)),
                   jnp.float32(jnp.inf), t_ema0, best0),
            None, length=steps)
    holdout_best = jnp.float32(jnp.inf)
    if val_mask is not None:
        holdout_best, params, C, batch_stats = best
    S_hat, _ = forward(params, batch_stats)
    aux = {"holdout_best": holdout_best, "final_fit": losses[-1]}
    if out_ema_decay > 0.0:
        aux["T_ema"] = t_ema
    return S_hat, C, losses, nmses, aux
