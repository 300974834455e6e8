from .mesh import (batch_sharding, batch_spec, create_mesh, param_shardings,
                   replicated, shard_params)
