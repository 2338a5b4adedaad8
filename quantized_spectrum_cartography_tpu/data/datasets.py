"""Dataset pipelines: simulator-backed SLF batches with random masking.

Re-design of the reference's torch Datasets (`deep_prior/slf_dataset.py`):
- SLFDataset      (slf_dataset.py:70-129): (mask || masked map, target)
- SLFDataset1bit  (slf_dataset.py:131-195): target thresholded to +-1 at
  mean_slf before masking
- GANSample       (slf_dataset.py:30-67): generator-backed samples

The reference reads file-per-index .pt tensors from hardcoded /scratch
paths; here batches are generated on the fly from the JAX physics
simulator (no 500k-file dataset needed) or from a generator prior, all
as pure functions of a PRNG key -> device-resident batches.  A vmapped
batch is one XLA program; masks use per-sample rates drawn from
sample_size=[lo, hi] like the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterator, Tuple

import jax
import jax.numpy as jnp

from quantized_spectrum_cartography_tpu.config import PhysicsConfig


@dataclasses.dataclass(frozen=True)
class SLFBatchConfig:
    batch_size: int = 64
    sample_lo: float = 0.01     # sample_size=[0.01, 0.20] (slf_dataset.py:73)
    sample_hi: float = 0.20
    onebit: bool = False        # SLFDataset1bit thresholding
    mean_slf: float = 0.0045
    normalize_peak: bool = False  # scale each SLF so max == 1


def make_slf_sampler(
    physics: PhysicsConfig = PhysicsConfig(),
) -> Callable[[jax.Array, int], jnp.ndarray]:
    """Pure fn (key, batch) -> SLFs [B, I, J] from the physics simulator."""
    # deferred: physics.simulator imports data.fixtures (package cycle)
    from quantized_spectrum_cartography_tpu.physics.shadowing import (
        correlation_cholesky,
    )
    from quantized_spectrum_cartography_tpu.physics.simulator import (
        sample_slf,
    )

    chol = jnp.asarray(correlation_cholesky(
        physics.grid_size, physics.decorrelation_distance))

    def sample(key: jax.Array, batch: int) -> jnp.ndarray:
        keys = jax.random.split(key, batch)
        S, _ = jax.vmap(lambda k: sample_slf(k, chol, physics))(keys)
        return S

    return sample


def mask_batch(
    key: jax.Array,
    maps: jnp.ndarray,
    cfg: SLFBatchConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build ((mask || masked_map) [B,I,J,2], target [B,I,J,1]).

    Matches SLFDataset.__getitem__ (slf_dataset.py:107-127): per-sample
    Bernoulli mask with rate ~ U[lo, hi]; 1-bit variant thresholds the
    *masked input* at mean_slf to +-1 while the target stays raw
    (slf_dataset.py:176-195).
    """
    B = maps.shape[0]
    k_rate, k_mask = jax.random.split(key)
    rates = cfg.sample_lo + (cfg.sample_hi - cfg.sample_lo) * \
        jax.random.uniform(k_rate, (B, 1, 1))
    mask = (jax.random.uniform(k_mask, maps.shape) < rates).astype(maps.dtype)
    target = maps
    if cfg.normalize_peak:
        peak = jnp.max(jnp.abs(maps), axis=(1, 2), keepdims=True)
        target = maps / jnp.maximum(peak, 1e-12)
    source = target
    if cfg.onebit:
        source = jnp.where(target > cfg.mean_slf, 1.0, -1.0)
    inp = jnp.stack([mask, source * mask], axis=-1)       # [B, I, J, 2]
    return inp, target[..., None]


def slf_batches(
    key: jax.Array,
    cfg: SLFBatchConfig = SLFBatchConfig(),
    physics: PhysicsConfig = PhysicsConfig(),
) -> Iterator[Tuple[jnp.ndarray, jnp.ndarray]]:
    """Infinite iterator of (input, target) completion batches."""
    sampler = make_slf_sampler(physics)
    while True:
        key, k1, k2 = jax.random.split(key, 3)
        maps = sampler(k1, cfg.batch_size)
        yield mask_batch(k2, maps, cfg)


def gan_sample_batch(
    key: jax.Array,
    gen_apply: Callable[[jnp.ndarray], jnp.ndarray],
    batch: int,
    z_dim: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(samples [B,I,J], z [B,z_dim]) from a trained generator — the
    `GANSample` dataset (slf_dataset.py:30-67)."""
    z = jax.random.normal(key, (batch, z_dim))
    return gen_apply(z), z


def boundaries_from_samples(
    key: jax.Array,
    num_bins: int = 8,
    num_samples: int = 10000,
    log_domain: bool = False,
    log_offset: float = 1e-10,
    physics: PhysicsConfig = PhysicsConfig(),
):
    """Estimate equal-count bin boundaries from simulator-drawn SLFs.

    Reference `get_boundaries_from_samples` (qmc/utils.py:76-90) draws 10k
    maps through a DataLoader over a /scratch file dataset; here the maps
    come straight from the on-device simulator (no file dataset needed).
    Returns (boundaries [num_bins+1], min-gap std) like `_find_boundaries`.
    """
    from quantized_spectrum_cartography_tpu.ops.boundaries import (
        find_boundaries,
    )

    sampler = make_slf_sampler(physics)
    chunk = min(num_samples, 512)
    vals = []
    n = 0
    while n < num_samples:
        key, k = jax.random.split(key)
        S = sampler(k, chunk)
        vals.append(S.reshape(-1))
        n += chunk
    samples = jnp.concatenate(vals)
    if log_domain:
        samples = jnp.log(samples + log_offset)
    return find_boundaries(samples, num_bins=num_bins)
