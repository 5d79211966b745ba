"""Device-mesh scaling: data-parallel slot sharding over ICI/DCN."""

from .mesh import make_mesh, shard_sim_batch  # noqa: F401
