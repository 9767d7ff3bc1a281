"""Device-mesh layer: CTU-tile sharding, halo exchange, wavefront
batching, GOP sharding (jax.sharding + shard_map over ICI/DCN).

The reference has no encoder-side distribution (single-threaded C++;
SURVEY.md §2.6); its only comm is NCCL DDP for CNN training. Here the
mesh layer is first-class: the spatial dimension shards as CTU-column
tiles with ppermute halo exchange, the temporal dimension as GOP
sharding, and training as data parallelism.
"""

from .mesh import make_mesh, tile_axis
from .tiles import halo_exchange_width, sharded_level_cost

__all__ = ["make_mesh", "tile_axis", "halo_exchange_width",
           "sharded_level_cost"]
