from quantized_spectrum_cartography_tpu.ops.pallas.fused_likelihood import (  # noqa: F401
    fused_quantized_nll,
    fused_nll_reference,
    pack_bounds,
    pack_bounds_1bit,
    MASK_SENTINEL,
)
