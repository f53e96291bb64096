from .mesh import make_mesh, shard_batch, shard_hubert_params, replicate
