"""Power-spectral-density bank: Gaussian / sinc^2 bumps.

Re-design of the PSD construction in `qmc/generate_map.m:10-14,54-86`:
per emitter, 3 random peaks with amplitudes 0.5 + 1.5*U, the first peak
anchored (separable mode) at band 5 + r, remaining peak centers drawn from
ind_psd = 10:2:K-2, plus an extra experiment bump at band 20; columns are
L2-normalized (generate_map.m:88 via ColumnNormalization.m).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gaussian_bump(indK: jnp.ndarray, f0, sigma) -> jnp.ndarray:
    """exp(-(k - f0)^2 / (2 sigma^2))  (generate_map.m:11)."""
    return jnp.exp(-jnp.square(indK - f0) / (2.0 * jnp.square(sigma)))


def sinc_bump(indK: jnp.ndarray, f0, a) -> jnp.ndarray:
    """sinc((k-f0)/a)^2 * [|k-f0|/a <= 1]  (generate_map.m:13)."""
    u = (indK - f0) / a
    return jnp.square(jnp.sinc(u)) * (jnp.abs(u) <= 1.0)


def column_normalize(C: jnp.ndarray, axis: int = -1):
    """L2-normalize along `axis`, returning (normalized, norms)
    (ColumnNormalization.m:1-19; zero columns pass through)."""
    n = jnp.linalg.norm(C, axis=axis, keepdims=True)
    return jnp.where(n > 0, C / jnp.where(n > 0, n, 1.0), C), jnp.squeeze(n, axis)


def sample_psd(
    key: jax.Array,
    emitter_index: int | jnp.ndarray,
    K: int,
    basis: str = "g",
    separable: bool = True,
    num_peaks: int = 3,
    shared_peaks: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """One emitter's PSD c_r in R^K (un-normalized).

    separable=True anchors the first peak at band 5 + r with width 2+3U and
    adds the fixed bump at band 20 (generate_map.m:54-70); otherwise peak
    centers `shared_peaks` are shared across emitters and the first peak
    sits at 5 + r + 1 (generate_map.m:72-86).
    """
    indK = jnp.arange(1, K + 1, dtype=jnp.float32)  # MATLAB 1-based band index
    bump = gaussian_bump if basis == "g" else sinc_bump
    k_peaks, k_amp, k_w0, k_w = jax.random.split(key, 4)

    amps = 0.5 + 1.5 * jax.random.uniform(k_amp, (num_peaks + 1,))
    widths = 2.0 + 2.0 * jax.random.uniform(k_w, (num_peaks,))

    if shared_peaks is None:
        # candidate centers 10:2:K-2, drawn without replacement
        cand = jnp.arange(10, K - 1, 2, dtype=jnp.float32)
        if cand.shape[0] < num_peaks - 1:
            raise ValueError(
                f"K={K} too small for {num_peaks} peaks: the reference's "
                "candidate range 10:2:K-2 (generate_map.m:54-86) needs "
                f"K >= {10 + 2 * (num_peaks - 1)}; use more bands or fewer "
                "num_peaks_per_psd")
        perm = jax.random.permutation(k_peaks, cand.shape[0])
        centers = cand[perm[: num_peaks - 1]]
    else:
        centers = shared_peaks

    if separable:
        first_w = 2.0 + 3.0 * jax.random.uniform(k_w0, ())
        c = amps[0] * bump(indK, 5.0 + emitter_index, first_w)
    else:
        first_w = 2.0 + 2.0 * jax.random.uniform(k_w0, ())
        c = amps[0] * bump(indK, 5.0 + emitter_index + 1.0, first_w)

    for q in range(num_peaks - 1):
        c = c + amps[q + 1] * bump(indK, centers[q], widths[q])

    if separable:
        c = c + amps[num_peaks] * bump(indK, 20.0, widths[num_peaks - 1])
    return c
