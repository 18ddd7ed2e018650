from frameino_tpu.parallel.sharding import (
    dit_param_specs,
    shard_pytree,
    activation_spec,
    constrain,
)
from frameino_tpu.parallel import multihost
