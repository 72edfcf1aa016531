"""Multi-chip parallelism: mesh construction and the SPMD train step."""

from .mesh import data_sharding, initialize_distributed, make_mesh, replicated  # noqa: F401
from .train_step import make_sharded_train_step  # noqa: F401
