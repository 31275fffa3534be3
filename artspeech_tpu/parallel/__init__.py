from artspeech_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    params_shardings,
    replicated,
    shard_batch,
)
