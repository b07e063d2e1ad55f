from .mapping import Mapping
from .sharding import shard_state, named_sharding, replicate
