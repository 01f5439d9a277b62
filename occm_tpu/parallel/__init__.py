from occm_tpu.parallel.mesh import make_mesh, batch_sharding, replicated
from occm_tpu.parallel.sharding import (
    opt_state_shardings,
    param_shardings,
    place_state_on_mesh,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "opt_state_shardings",
    "param_shardings",
    "place_state_on_mesh",
    "shard_batch",
]
