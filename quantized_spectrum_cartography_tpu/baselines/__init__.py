from quantized_spectrum_cartography_tpu.baselines.spa import (  # noqa: F401
    column_sum_normalize,
    nmf_spa,
    spa_indices,
)
from quantized_spectrum_cartography_tpu.baselines.nnls import nnls, nnls_rows  # noqa: F401
from quantized_spectrum_cartography_tpu.baselines.tps import tps_complete  # noqa: F401
from quantized_spectrum_cartography_tpu.baselines.harness import (  # noqa: F401
    BatchedHarness,
    Condition,
    HarnessProblem,
    REFERENCE_AXES,
    best_permutation,
    condition_grid,
    evaluate_method,
    make_problem,
    run_conditions,
    run_conditions_batched,
    run_sweep,
    standard_methods,
)
from quantized_spectrum_cartography_tpu.baselines.btd import btd_ll1  # noqa: F401
from quantized_spectrum_cartography_tpu.baselines.pretrained import (  # noqa: F401
    load_pretrained_methods,
)
