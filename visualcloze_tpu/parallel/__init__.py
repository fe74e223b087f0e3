from .mesh import (
    AXES,
    auto_mesh,
    batch_sharding,
    create_mesh,
    initialize_distributed,
    replicated,
)
from .sharding import (
    constrain_batch,
    shard_large_params,
    shard_micro_batches,
    flux_param_spec,
    make_flux_shardings,
    replicate_tree,
    shard_params,
)

__all__ = [
    "AXES", "auto_mesh", "batch_sharding", "create_mesh",
    "initialize_distributed", "replicated",
    "constrain_batch", "shard_large_params", "shard_micro_batches",
    "flux_param_spec", "make_flux_shardings",
    "replicate_tree", "shard_params",
]
