"""Numerical core: quantizer, likelihood, reconstruction, metrics, kernels."""

from quantized_spectrum_cartography_tpu.ops import boundaries as boundaries
from quantized_spectrum_cartography_tpu.ops.quantizer import (  # noqa: F401
    quantize,
    quantize_log,
    dequantize_midpoints,
    dither_probit,
    dither_sigmoid,
    F_probit,
    F_sigmoid,
)
from quantized_spectrum_cartography_tpu.ops.likelihood import (  # noqa: F401
    prob_probit,
    log_prob_probit,
    gather_bin_bounds,
    masked_nll,
    neg_likelihood_1bit,
    deterministic_cost,
)
from quantized_spectrum_cartography_tpu.ops.lowrank import (  # noqa: F401
    get_tensor,
    get_tensor_flat,
    outer,
    project_nonneg,
    project_rank,
    project_rank_subspace,
)
from quantized_spectrum_cartography_tpu.ops.metrics import (  # noqa: F401
    detection_counts,
    nae,
    nae_tensor,
    nmse,
    nmse_log,
    sre,
)
