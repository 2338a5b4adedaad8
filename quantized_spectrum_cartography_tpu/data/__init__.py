from quantized_spectrum_cartography_tpu.data.fixtures import (  # noqa: F401
    Problem,
    load_onebit_fixture,
    REFERENCE_FIXTURE,
)
from quantized_spectrum_cartography_tpu.data.datasets import (  # noqa: F401
    SLFBatchConfig,
    boundaries_from_samples,
    gan_sample_batch,
    make_slf_sampler,
    mask_batch,
    slf_batches,
)
