from quantized_spectrum_cartography_tpu.data.fixtures import (  # noqa: F401
    Problem,
    load_onebit_fixture,
    REFERENCE_FIXTURE,
)
