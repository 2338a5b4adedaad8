from quantized_spectrum_cartography_tpu.models.generator import (  # noqa: F401
    DCGANGenerator,
    Generator64,
    Generator128,
    Generator256,
    Generator512,
    make_generator,
)
from quantized_spectrum_cartography_tpu.models.dip import DecoderDip  # noqa: F401
from quantized_spectrum_cartography_tpu.models.ae import (  # noqa: F401
    Autoencoder,
    AutoencoderLinear,
    Decoder,
    Encoder,
    EncoderDecoder,
)
from quantized_spectrum_cartography_tpu.models.builders import (  # noqa: F401
    DictDiscriminator,
    DictEncoder,
    GANEncoder,
    InvalidArchitectureError,
)
from quantized_spectrum_cartography_tpu.models.discriminator import (  # noqa: F401
    Discriminator,
    SNDiscriminator,
)
from quantized_spectrum_cartography_tpu.models.vae import VAE, betaVAE  # noqa: F401
from quantized_spectrum_cartography_tpu.models.layers import (  # noqa: F401
    total_variation_loss,
)
from quantized_spectrum_cartography_tpu.models.aae import (  # noqa: F401
    AAEDecoder,
    AAEEncoder,
    LatentDiscriminator,
)
