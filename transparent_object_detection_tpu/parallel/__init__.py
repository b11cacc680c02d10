from transparent_object_detection_tpu.parallel.distributed import (  # noqa: F401
    initialize_multihost,
    process_count,
    process_index,
)
from transparent_object_detection_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    batch_sharding,
    local_batch_slice,
    make_mesh,
    replicate_state,
    replicated,
    shard_batch,
)
from transparent_object_detection_tpu.parallel.tp import (  # noqa: F401
    MODEL_AXIS,
    make_2d_mesh,
    shard_params_tp,
    tp_shardings,
)
