"""Device-mesh scale-out (data-parallel points, probe-parallel traces)."""
from .sharding import (make_mesh, replicate, shard_points, shard_probes,
                       sharded_fit, sharded_gradient)

__all__ = ["make_mesh", "replicate", "shard_points", "shard_probes",
           "sharded_fit", "sharded_gradient"]
