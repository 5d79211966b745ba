"""Device-mesh scaling: data-parallel slot sharding over ICI/DCN."""

from .mesh import make_mesh, shard_sim_batch, shard_sim_batch_numbered  # noqa: F401
from .multihost import (  # noqa: F401
    MultiHostGenomeRunner,
    MultiHostMetagenomeRunner,
    MultiHostModeRunner,
    init_distributed,
    merge_host_shards,
)
