from quantized_spectrum_cartography_tpu.physics.simulator import (  # noqa: F401
    generate_map,
    generate_map_batch,
    generate_onebit_problem,
    sample_entry_mask,
    path_loss,
)
from quantized_spectrum_cartography_tpu.physics.shadowing import (  # noqa: F401
    correlation_cholesky,
    sample_shadowing,
)
from quantized_spectrum_cartography_tpu.physics.psd import (  # noqa: F401
    column_normalize,
    gaussian_bump,
    sinc_bump,
    sample_psd,
)
