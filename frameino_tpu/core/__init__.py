from frameino_tpu.core.dtypes import DTypePolicy, DEFAULT_POLICY, FP32_POLICY
from frameino_tpu.core.meshes import (
    MeshConfig,
    make_mesh,
    logical_to_mesh_spec,
    shard_params,
    DIT_LOGICAL_RULES,
)
from frameino_tpu.core import prng
from frameino_tpu.core import tree
