from ssd3d.parallel.mesh import make_mesh, batch_sharding, replicated

__all__ = ["make_mesh", "batch_sharding", "replicated"]
