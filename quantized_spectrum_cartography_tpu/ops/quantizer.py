"""Ordinal quantizer, dithers and link functions.

TPU-native re-design of `qmc/quantization_model.py:8-68` and
`qmc/quantization_model_log.py:9-78`: the reference assigns bin indices with
a Python loop over boundaries; here it is a single vectorized
`jnp.searchsorted`, fully jittable and vmappable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SQRT2 = 1.414213  # the reference hardcodes 1.414213 (quantization_model.py:61)


def _bin_indices(noisy: jnp.ndarray, bin_boundaries: jnp.ndarray) -> jnp.ndarray:
    """Bin index per entry: Y = #{internal boundaries b_i : b_i < x}.

    Matches the loop semantics of `quantization_model.py:16-19`:
    values <= b_1 map to 0, values > b_{n-1} map to num_bins-1 (the last
    boundary is treated as +inf).
    """
    internal = bin_boundaries[1:-1]
    return jnp.searchsorted(internal, noisy, side="left").astype(jnp.int32)


def quantize(
    key: jax.Array,
    X: jnp.ndarray,
    noise_std: float,
    bin_boundaries: jnp.ndarray,
) -> jnp.ndarray:
    """Linear-domain ordinal quantization Y = Q(X + E), E ~ N(0, noise_std).

    Reference: `qmc/quantization_model.py:8-20`.
    """
    bin_boundaries = jnp.asarray(bin_boundaries, dtype=X.dtype)
    noisy = X + jax.random.normal(key, X.shape, dtype=X.dtype) * noise_std
    return _bin_indices(noisy, bin_boundaries)


def quantize_log(
    key: jax.Array,
    X: jnp.ndarray,
    noise_std: float,
    bin_boundaries: jnp.ndarray,
    offset: float,
) -> jnp.ndarray:
    """Log-domain ordinal quantization Y = Q(log(X + offset) + E).

    Reference: `qmc/quantization_model_log.py:9-21`.
    """
    bin_boundaries = jnp.asarray(bin_boundaries, dtype=X.dtype)
    noisy = jnp.log(X + offset) + jax.random.normal(key, X.shape, dtype=X.dtype) * noise_std
    return _bin_indices(noisy, bin_boundaries)


def dequantize_midpoints(
    Y: jnp.ndarray, bin_boundaries: jnp.ndarray
) -> jnp.ndarray:
    """Bin-midpoint dequantization (W+U)/2 feeding the Euclidean/DowJons
    surrogate solver.  Reference: `qmc/quantization_model_log.py:43-51`."""
    bb = jnp.asarray(bin_boundaries)
    W = bb[Y]
    U = bb[Y + 1]
    return (W + U) / 2.0


def F_probit(y: jnp.ndarray, std) -> jnp.ndarray:
    """Probit link Phi(y/std) = (1 + erf(y/(std*sqrt2)))/2.

    Reference: `qmc/quantization_model.py:57-61` (same hardcoded 1.414213).
    """
    return 0.5 * (1.0 + jax.lax.erf(y / (std * _SQRT2)))


def log_F_probit(y: jnp.ndarray, std) -> jnp.ndarray:
    """Numerically stable log Phi(y/std) via log_ndtr (handles deep tails
    where the reference's erf formulation underflows to log(0))."""
    return jax.scipy.special.log_ndtr(y / (std * _SQRT2 / jnp.sqrt(2.0)))


def F_sigmoid(y: jnp.ndarray) -> jnp.ndarray:
    """Logistic link (reference `qmc/quantization_model.py:43-47`)."""
    return jax.nn.sigmoid(y)


def dither_probit(key: jax.Array, y: jnp.ndarray, std) -> jnp.ndarray:
    """Sample z ~ Bernoulli(Phi(y/std)) (reference `quantization_model.py:63-68`)."""
    return jax.random.bernoulli(key, F_probit(y, std)).astype(y.dtype)


def dither_sigmoid(key: jax.Array, y: jnp.ndarray) -> jnp.ndarray:
    """Sample z ~ Bernoulli(sigmoid(y)) (reference `quantization_model.py:49-55`)."""
    return jax.random.bernoulli(key, F_sigmoid(y)).astype(y.dtype)


def pack_bits_host(y01) -> "np.ndarray":
    """Host-side bit-pack of 1-bit observations for transfer: {0,1} array
    -> uint8 [..., ceil(last/8)] (np.packbits along the last axis).  The
    wire format for serving: 1 bit/entry instead of 8-32."""
    import numpy as np

    arr = np.asarray(y01)
    return np.packbits(arr.astype(np.uint8), axis=-1)


def unpack_bits(packed: jnp.ndarray, last_dim: int) -> jnp.ndarray:
    """Device-side unpack of `pack_bits_host` output back to {0,1} float32
    [..., last_dim] — pure bit ops, fuses into whatever consumes it."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)      # MSB-first
    bits = (packed[..., None] >> shifts) & jnp.uint8(1)
    flat = bits.reshape(*packed.shape[:-1], packed.shape[-1] * 8)
    return flat[..., :last_dim].astype(jnp.float32)
