from frameino_tpu.core.dtypes import DTypePolicy, DEFAULT_POLICY, FP32_POLICY
from frameino_tpu.core.meshes import (
    MeshConfig,
    make_mesh,
    logical_to_mesh_spec,
    shard_params,
    DIT_LOGICAL_RULES,
)
from frameino_tpu.core.config import (load_config, filter_kwargs,
                                      make_dataclass_from_config)
from frameino_tpu.core.checkpoint import (save_checkpoint,
                                          restore_checkpoint,
                                          latest_checkpoint)
from frameino_tpu.core import prng
from frameino_tpu.core import tree
from frameino_tpu.core import profiling
