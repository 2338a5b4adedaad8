"""Orbax checkpointing for prior weights and solver state.

Replaces the reference's ad-hoc `torch.save`/`torch.load` dict handling
(checkpoints keyed 'g_model_state_dict'/'model_state_dict', loaded with
map_location='cpu' at `qmc/qmc_utils.py:22-33`, `backup/algorithms/
deep_comp.py:14-16`).  Adds what the reference lacks entirely: optimizer
state + mid-run resume (SURVEY.md section 5.4).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def save_checkpoint(path: str, state: Any, force: bool = True) -> None:
    """Save a pytree (params / TrainState / solver snapshot) to `path`."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=force)


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Restore a pytree; `target` (matching structure of abstract arrays)
    enables dtype/shape-checked restoration and sharded placement.

    Restoration is device-agnostic (the equivalent of the reference's
    map_location='cpu'): checkpoints written on the TPU chip restore on a
    CPU-only process and vice versa, by dropping the recorded shardings
    when they name devices absent from this runtime."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            abstract = jax.tree_util.tree_map(
                ocp.utils.to_shape_dtype_struct, target)
            return ckptr.restore(path, abstract)
        try:
            return ckptr.restore(path)
        except ValueError:
            # recorded shardings reference another platform's devices:
            # re-restore onto the default device from the saved metadata
            meta = ckptr.metadata(path).item_metadata
            sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
            abstract = jax.tree_util.tree_map(
                lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype,
                                               sharding=sharding),
                meta)
            return ckptr.restore(path, abstract)


def latest_step_dir(root: str) -> Optional[str]:
    """Most recent step_N subdirectory under a training run root."""
    if not os.path.isdir(root):
        return None
    steps = [d for d in os.listdir(root) if d.startswith("step_")]
    if not steps:
        return None
    best = max(steps, key=lambda d: int(d.split("_")[1]))
    return os.path.join(root, best)
