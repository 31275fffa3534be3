from artspeech_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    params_shardings,
    replicated,
    shard_batch,
)
from artspeech_tpu.parallel.distributed import (
    distribute_state,
    initialize_multihost,
    run_distributed_step,
)
