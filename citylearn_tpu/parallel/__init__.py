from citylearn_tpu.parallel.mesh import (  # noqa: F401
    district_mesh,
    initialize_distributed,
    shard_district_batch,
)
