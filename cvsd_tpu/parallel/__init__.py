from cvsd_tpu.parallel.mesh import (  # noqa: F401
    MeshConfig,
    batch_sharding,
    build_mesh,
    default_mesh_shape,
    replicated_sharding,
    shard_batch,
)
