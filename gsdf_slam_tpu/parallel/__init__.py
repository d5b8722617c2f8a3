"""Device-mesh parallelism for the mapper."""

from .sharding import make_sharded_train_step  # noqa: F401
