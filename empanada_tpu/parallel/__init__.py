from empanada_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    initialize_distributed,
    replicated_sharding,
    shard_batch,
)
