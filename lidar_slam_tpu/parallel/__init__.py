"""Multi-chip scale-out: device meshes, sharded kNN, batched multi-sequence SLAM."""

from .batched import BatchedSlamEngine, make_batched_fns, stack_states  # noqa: F401
from .mesh import make_mesh  # noqa: F401
from .sharded_detect import sc_topk_sharded  # noqa: F401
from .sharded_knn import (  # noqa: F401
    make_sharded_nn1,
    nn1_source_sharded,
    nn1_target_sharded,
)
