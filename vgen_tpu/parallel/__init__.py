from . import collectives
from .collectives import (all_gather, all_reduce, broadcast, broadcast_object,
                          diff_all_gather,
                          diff_all_reduce, diff_copy, diff_scatter,
                          generalized_all_gather, generalized_gather,
                          reduce_dict, reduce_scatter,
                          sinkhorn, spherical_kmeans)
from .mesh import (batch_sharding, batch_spec, create_mesh, param_shardings,
                   replicated, shard_params)
