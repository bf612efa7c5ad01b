from .mesh import (  # noqa: F401
    barrier,
    data_sharding,
    initialize_distributed,
    is_main_process,
    local_batch_size,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
