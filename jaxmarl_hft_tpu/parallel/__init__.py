from .mesh import (make_mesh, shard_leading_axis, replicate,
                   shard_runner_state, batch_sharding, replicated,
                   initialize_multihost)
