"""Device-mesh parallelism for the mapper."""

from .param_sharding import (  # noqa: F401
    gather_state,
    make_param_sharded_train_step,
    shard_state_to_mesh,
)
from .sharding import make_sharded_train_step  # noqa: F401
from .tile_sharding import make_tile_sharded_train_step  # noqa: F401
from .view_tile_sharding import (  # noqa: F401
    make_view_tile_mesh,
    make_view_tile_sharded_train_step,
)
