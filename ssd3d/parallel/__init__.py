from ssd3d.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    fsdp_shardings,
)
from ssd3d.parallel.distributed import initialize_from_env, make_global_batch

__all__ = ["make_mesh", "batch_sharding", "replicated", "fsdp_shardings",
           "initialize_from_env", "make_global_batch"]
