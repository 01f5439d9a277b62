from occm_tpu.parallel.mesh import (
    batch_sharding,
    compute_mesh,
    current_mesh,
    data_axes,
    data_parallel_size,
    data_shard_for_process,
    data_spec,
    make_mesh,
    replicated,
)
from occm_tpu.parallel.sharding import (
    opt_state_shardings,
    param_shardings,
    train_state_shardings,
    place_state_on_mesh,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "compute_mesh",
    "current_mesh",
    "batch_sharding",
    "data_axes",
    "data_parallel_size",
    "data_shard_for_process",
    "data_spec",
    "replicated",
    "opt_state_shardings",
    "param_shardings",
    "train_state_shardings",
    "place_state_on_mesh",
    "shard_batch",
]
