from quantized_spectrum_cartography_tpu.utils.profiling import (  # noqa: F401
    likelihood_roofline,
    time_jitted,
    trace,
)
