"""Multi-host (multi-process) distribution layer.

New subsystem with no reference equivalent: the reference
(shresthasagar/quantized_spectrum_cartography) is single-process CPU
throughout (`qmc/qmc_utils.py:27` forces map_location='cpu'; no
torch.distributed anywhere — SURVEY.md section 5.8).  This module provides
the north-star scale-out axis: N processes (hosts), each owning a set of
local devices, cooperating through one global mesh.

Design (TPU-pod shaped, tested on the standard CPU substitute):

- `init_distributed`   — `jax.distributed.initialize` against a coordinator;
  after it returns, `jax.devices()` spans every process's chips and
  `jax.process_index()` identifies this host.
- `make_global_mesh`   — one Mesh over ALL devices (local + remote), logical
  axes ('data', 'model').  Map-batch recoveries shard over 'data' with zero
  communication; K-axis shards over 'model' ride ICI within a host.
- `local_batch_to_global` — per-process data feeding: each host materializes
  only its own slice of the global batch and
  `jax.make_array_from_process_local_data` assembles the logically-global
  sharded array (no host ever holds the full batch — the point of scaling
  to 10k-map datasets, BASELINE.json config 5).
- `multihost_recover_lowrank` — the production entry: local observations in,
  globally-sharded recovery out, with the per-host result slice and a
  replicated scalar cost for cross-host agreement checks.

Launch N local processes as a pod-slice substitute with
`tools/multihost_launch.py`; a 2-process CPU integration test lives in
`tests/test_multihost.py`.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from quantized_spectrum_cartography_tpu.config import SolverConfig
from quantized_spectrum_cartography_tpu.solvers.lowrank_mle import (
    recover_lowrank_mle,
)


def configure_cpu_substitute(num_local_devices: int) -> None:
    """Configure this process as one 'host' of the CPU pod-slice substitute:
    N virtual CPU devices + gloo cross-process collectives.  Must run before
    any JAX backend use and before init_distributed."""
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", num_local_devices)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Join the process group.  On a real pod slice all arguments are
    auto-detected from the TPU environment (pass nothing); on the CPU
    substitute the launcher passes them explicitly."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)


def make_global_mesh(
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Tuple[str, str] = ("data", "model"),
) -> Mesh:
    """2-D mesh over every device in the process group.

    Default layout is all-'data' (shape (n, 1)): batched recoveries are
    independent, so the data axis may freely span DCN (hosts) — there is
    no collective to slow down.  A nontrivial 'model' dimension should
    divide the per-host device count so K-axis psums stay on ICI."""
    devices = jax.devices()          # global: all processes
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != {n} global devices")
    if shape[1] > 1:
        per_host = len(jax.local_devices())
        if per_host % shape[1] != 0:
            raise ValueError(
                f"'model' dim {shape[1]} must divide the per-host device "
                f"count {per_host} so the psum stays on ICI, not DCN")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def process_local_slice(global_batch: int, mesh: Mesh) -> Tuple[int, int]:
    """[start, stop) of the global batch this process feeds, given batch
    sharded over 'data'.  Requires the data axis to be laid out in process
    order (true for make_global_mesh's reshape of jax.devices())."""
    n_proc = jax.process_count()
    if global_batch % n_proc != 0:
        raise ValueError(
            f"global batch {global_batch} must divide process count {n_proc}")
    per = global_batch // n_proc
    i = jax.process_index()
    return i * per, (i + 1) * per


def local_batch_to_global(
    mesh: Mesh, local: np.ndarray | jnp.ndarray, batch_axis: int = 0
) -> jax.Array:
    """Assemble a logically-global batch-sharded array from this process's
    local slice (jax.make_array_from_process_local_data)."""
    spec = [None] * np.ndim(local)
    spec[batch_axis] = "data"
    sharding = NamedSharding(mesh, P(*spec))
    return jax.make_array_from_process_local_data(sharding, np.asarray(local))


def gather_local(arr: jax.Array, batch_axis: int = 0) -> np.ndarray:
    """This process's rows of a batch-sharded global array, in global
    order (concatenated addressable shards)."""
    shards = sorted(arr.addressable_shards, key=lambda s: s.index[batch_axis])
    return np.concatenate([np.asarray(s.data) for s in shards],
                          axis=batch_axis)


def multihost_recover_lowrank(
    mesh: Mesh,
    T_obs_local: np.ndarray,     # [B_local, K, I, J] this host's maps
    S_init_local: np.ndarray,    # [B_local, R, I, J]
    C_init_local: np.ndarray,    # [B_local, R, K]
    cfg: SolverConfig,
    mean: float,
    std: float,
):
    """Globally-sharded batched 1-bit low-rank MLE over all hosts.

    Each host feeds only its local slice; the vmapped solver runs SPMD
    over the 'data' axis (communication-free).  Returns
    (local result slices dict, replicated total cost scalar) — the scalar
    is a global psum so every host computes the identical value, which the
    launcher uses as a cross-host agreement check.
    """
    T_obs = local_batch_to_global(mesh, T_obs_local)
    S0 = local_batch_to_global(mesh, S_init_local)
    C0 = local_batch_to_global(mesh, C_init_local)

    solver = jax.vmap(
        functools.partial(recover_lowrank_mle, cfg=cfg, mean=mean, std=std))

    def run(t, s, c):
        res = solver(t, s, c)
        # final-iteration per-map cost; summing gives one global scalar
        total = jnp.sum(res.costs[:, -1])
        return res.S, res.C, res.costs, total

    in_sh = (T_obs.sharding, S0.sharding, C0.sharding)
    out_sh = (S0.sharding, C0.sharding,
              NamedSharding(mesh, P("data", None)),
              NamedSharding(mesh, P()))
    fn = jax.jit(run, in_shardings=in_sh, out_shardings=out_sh)
    S, C, costs, total = fn(T_obs, S0, C0)
    jax.block_until_ready(total)
    return (
        {
            "S": gather_local(S),
            "C": gather_local(C),
            "costs": gather_local(costs),
        },
        float(total),
    )
