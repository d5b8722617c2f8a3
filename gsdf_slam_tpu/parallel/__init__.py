"""Device-mesh parallelism for the mapper."""

from .sharding import make_sharded_train_step  # noqa: F401
from .tile_sharding import make_tile_sharded_train_step  # noqa: F401
