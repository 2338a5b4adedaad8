"""Typed configuration for the whole framework.

The reference scatters its constants across notebook cells and module tops
(`qmc/utils.py:10-54`, `qmc/generate_test_data.m:9-35`, `qmc/qmc.ipynb` cell 1).
Here everything lives in frozen dataclasses so a problem/solve is fully
described by a pytree-friendly config object.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class PhysicsConfig:
    """Synthetic radio-map physics (reference `qmc/generate_map.m`,
    `qmc/generate_test_data.m:9-35`)."""

    grid_size: int = 51            # I = J  (50x50 grid at resolution 1 -> 51 points)
    num_bands: int = 64            # K
    num_emitters: int = 2          # R
    shadow_sigma: float = 4.0      # log-normal shadowing std (dB)
    decorrelation_distance: float = 90.0   # Xc; p = exp(-1/Xc)
    psd_basis: str = "g"           # 'g' gaussian bumps | 's' sinc^2 bumps
    separable: bool = True
    num_peaks_per_psd: int = 3
    path_loss_d0: float = 2.0      # min(1, (d/d0)^-alpha)
    alpha_lo: float = 2.0          # alpha ~ U[alpha_lo, alpha_lo + alpha_spread]
    alpha_spread: float = 0.5
    mean_slf: float = 0.0045       # 1-bit threshold (generate_test_data.m:27)
    std_slf: float = 0.0191


@dataclasses.dataclass(frozen=True)
class QuantizerConfig:
    """Quantization / observation model.

    domain='log' applies link(x) = log(x + offset) before dithering+binning
    (reference `qmc/quantization_model_log.py:9-21`); domain='linear' is the
    identity link (`qmc/quantization_model.py:8-20`).
    """

    boundaries: Tuple[float, ...] = ()      # bin boundaries, len = num_bins + 1
    noise_std: float = 5.0                  # dither / probit sigma
    domain: str = "log"                     # 'log' | 'linear'
    log_offset: float = 1e-10
    link_model: str = "probit"              # 'probit' | 'sigmoid'

    @property
    def num_bins(self) -> int:
        return len(self.boundaries) - 1


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Alternating-optimization recovery (reference `qmc/qmc.ipynb` cell 1)."""

    max_iters: int = 500
    lr_c: float = 0.005
    lr_z: float = 0.01
    lr_s: float = 0.001
    lambda_c: float = 100.0
    lambda_s: float = 100.0
    c_inner_iters: int = 1
    s_inner_iters: int = 1
    z_dim: int = 256
    # randomized Z search (qmc.ipynb cell 1, i==1 branch)
    z_search_global: int = 200
    z_search_local: int = 200
    z_search_local_scale: float = 0.2
    z_search_at_iter: int = 1
    # low-rank MLE solver (backup/notebooks/onebit_lowrank.ipynb)
    rank_truncation: int = 10
    projection_interval: int = 5
    # 'svd'      — exact jnp.linalg.svd truncation (reference torch.svd)
    # 'subspace' — randomized QR subspace iteration, ~10x faster on TPU
    #              (ops/lowrank.py project_rank_subspace), default
    projection_method: str = "subspace"
    nonneg_slf: bool = False
    sample_fraction: float = 0.1
    mask_mode: str = "per_entry"    # 'per_entry' (qmc.ipynb) | 'per_location' (.mat fixture)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh for sharded batched recovery (new; no reference equivalent —
    the reference is single-process CPU, SURVEY.md section 5.8)."""

    data_axis: int = -1      # -1: all devices on the data (batch-of-maps) axis
    model_axis: int = 1      # frequency (K) axis sharding factor
    axis_names: Tuple[str, str] = ("data", "model")


@dataclasses.dataclass(frozen=True)
class ProblemConfig:
    physics: PhysicsConfig = dataclasses.field(default_factory=PhysicsConfig)
    quantizer: QuantizerConfig = dataclasses.field(default_factory=QuantizerConfig)
    solver: SolverConfig = dataclasses.field(default_factory=SolverConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    seed: int = 0


# --------------------------------------------------------------------------
# Config-file loading (INI / JSON)
# --------------------------------------------------------------------------

_SECTION_TYPES = {
    "physics": PhysicsConfig,
    "quantizer": QuantizerConfig,
    "solver": SolverConfig,
    "mesh": MeshConfig,
}


def _coerce(raw: str, typ):
    """Coerce an INI string to a dataclass field type (the reference's
    ConfigParser wrappers str_to_int_list/str_to_tuple_list live at
    deep_prior/networks/utils/utils.py:56-112; here field types drive the
    parse)."""
    import typing

    origin = typing.get_origin(typ)
    if origin is typing.Union:  # Optional[...]
        args = [a for a in typing.get_args(typ) if a is not type(None)]
        if raw.lower() in ("none", "null", ""):
            return None
        return _coerce(raw, args[0])
    if origin in (tuple, list):
        parts = [p for p in raw.replace(",", " ").split() if p]
        sub = typing.get_args(typ)[0] if typing.get_args(typ) else float
        vals = [_coerce(p, sub) for p in parts]
        return tuple(vals) if origin is tuple else vals
    if typ is bool or typ == "bool":
        return raw.strip().lower() in ("1", "true", "yes", "on")
    if typ is int or typ == "int":
        return int(raw)
    if typ is float or typ == "float":
        return float(raw)
    return raw


def _build_section(cls, entries: dict):
    import typing

    # resolve "from __future__ import annotations" string annotations
    hints = typing.get_type_hints(cls)
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for key, val in entries.items():
        name = key.replace("-", "_")
        if name not in fields:
            raise ValueError(
                f"unknown {cls.__name__} field '{key}' in config file")
        typ = hints[name]
        if isinstance(val, str):
            val = _coerce(val, typ)
        elif isinstance(val, list):
            val = tuple(val) if "Tuple" in str(typ) or "tuple" in str(typ) \
                else val
        kwargs[name] = val
    return cls(**kwargs)


def load_config_file(path: str) -> ProblemConfig:
    """Build a ProblemConfig from an INI or JSON file.

    INI sections / JSON top-level keys: [physics] [quantizer] [solver]
    [mesh], plus an optional 'seed'.  Unknown fields raise (typo safety).
    Replaces the reference's ConfigParser+argparse pipeline
    (deep_prior/networks/utils/interface.py:7-126) with typed parsing
    driven by the dataclass field types.
    """
    import json as _json
    import os

    if not os.path.exists(path):
        raise FileNotFoundError(path)
    sections: dict = {}
    seed = 0
    if path.endswith(".json"):
        data = _json.load(open(path))
        seed = int(data.pop("seed", 0))
        sections = data
    else:
        import configparser

        cp = configparser.ConfigParser()
        cp.read(path)
        for sec in cp.sections():
            if sec == "general":
                seed = cp.getint("general", "seed", fallback=0)
                continue
            sections[sec] = dict(cp.items(sec))
    kwargs = {}
    for name, entries in sections.items():
        if name not in _SECTION_TYPES:
            raise ValueError(f"unknown config section '{name}'")
        kwargs[name] = _build_section(_SECTION_TYPES[name], entries)
    return ProblemConfig(seed=seed, **kwargs)
