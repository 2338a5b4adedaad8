from quantized_spectrum_cartography_tpu.ops.pallas.fused_likelihood import (  # noqa: F401
    fused_onebit_nll,
    fused_quantized_nll,
    fused_quantized_nll_coded,
    fused_nll_reference,
    onebit_bounds,
    pack_bounds,
    pack_bounds_1bit,
    pack_codes,
    pack_codes_1bit,
    MASK_SENTINEL,
)
