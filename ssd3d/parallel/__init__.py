from ssd3d.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    fsdp_shardings,
)

__all__ = ["make_mesh", "batch_sharding", "replicated", "fsdp_shardings"]
