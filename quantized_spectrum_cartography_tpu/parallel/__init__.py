from quantized_spectrum_cartography_tpu.parallel.mesh import (  # noqa: F401
    batch_freq_sharding,
    batch_sharding,
    make_mesh,
    replicated,
)
from quantized_spectrum_cartography_tpu.parallel.sharded_solver import (  # noqa: F401
    batched_recover_lowrank,
    make_sharded_mle_step,
    recover_lowrank_mle_ksharded,
)
from quantized_spectrum_cartography_tpu.parallel.scheduler import (  # noqa: F401
    RecoveryScheduler,
)
from quantized_spectrum_cartography_tpu.parallel.multihost import (  # noqa: F401
    configure_cpu_substitute,
    gather_local,
    init_distributed,
    local_batch_to_global,
    make_global_mesh,
    multihost_recover_lowrank,
    process_local_slice,
)
