from .mesh import batch_sharding, make_mesh, replicate, shard_batch  # noqa: F401
