"""Device mesh + sharding vocabulary.

New subsystem with no reference equivalent (the reference is single-process
CPU; SURVEY.md section 5.8).  Logical axes:

- 'data'  — the batch-of-maps axis: independent recoveries, zero
            cross-shard communication (the dominant scaling axis;
            BASELINE.json config 5's 10k-map datasets)
- 'model' — the frequency (K) axis of T/Y/C for single large problems:
            the likelihood is entrywise in K, so only the S-factor
            gradient reduction (a psum over 'model') crosses shards

Collectives are XLA-inserted under jit-with-shardings; the shard_map
variants in sharded_solver.py spell the psum out explicitly.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Tuple[str, str] = ("data", "model"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """2-D mesh over the available devices; default all-data layout
    (shape (n, 1)) since map-batch parallelism needs no communication."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading batch-of-maps axis over 'data'."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def batch_freq_sharding(mesh: Mesh, ndim: int, freq_axis: int = 1) -> NamedSharding:
    """Shard batch over 'data' and the frequency axis over 'model'."""
    spec = [None] * ndim
    spec[0] = "data"
    spec[freq_axis] = "model"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
