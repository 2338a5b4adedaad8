from quantized_spectrum_cartography_tpu.training.checkpoints import (  # noqa: F401
    load_checkpoint,
    save_checkpoint,
)
from quantized_spectrum_cartography_tpu.training.gan_trainer import (  # noqa: F401
    GANTrainConfig,
    train_gan,
)
from quantized_spectrum_cartography_tpu.training.ae_trainer import (  # noqa: F401
    AETrainConfig,
    make_ae_completer,
    train_ae,
)
from quantized_spectrum_cartography_tpu.training.vae_trainer import (  # noqa: F401
    VAETrainConfig,
    heldout_elbo,
    train_vae,
)
