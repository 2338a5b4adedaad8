from quantized_spectrum_cartography_tpu.solvers.base import RecoveryResult  # noqa: F401
from quantized_spectrum_cartography_tpu.solvers.lowrank_mle import (  # noqa: F401
    recover_lowrank_mle,
)
from quantized_spectrum_cartography_tpu.solvers.mle_gan import recover_mle_gan  # noqa: F401
from quantized_spectrum_cartography_tpu.solvers.dowjons import recover_dowjons  # noqa: F401
from quantized_spectrum_cartography_tpu.solvers.gan_inversion import (  # noqa: F401
    init_z,
    run_onebit_inversion,
)
from quantized_spectrum_cartography_tpu.solvers.dip_solver import (  # noqa: F401
    recover_dip,
    recover_dip_tensor,
)
from quantized_spectrum_cartography_tpu.solvers.priors import (  # noqa: F401
    make_generator_apply,
    randomized_search,
)
from quantized_spectrum_cartography_tpu.solvers.completion import (  # noqa: F401
    optimize_z,
    recover_dowjons_ae,
    recover_dowjons_ae_latent,
    recover_dowjons_unquantized,
    recover_masked_mse,
    run_descent_ae,
)
from quantized_spectrum_cartography_tpu.solvers.nasdac import recover_nasdac  # noqa: F401
from quantized_spectrum_cartography_tpu.solvers.vae_prior import (  # noqa: F401
    encoder_init,
    load_vae_prior,
    make_vae_generator,
)
from quantized_spectrum_cartography_tpu.solvers.calibrate import (  # noqa: F401
    recalibrate_gain,
)
