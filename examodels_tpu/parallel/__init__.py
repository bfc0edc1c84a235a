from .distributed import init_distributed, scenario_mesh
from .partition import partition_model, partition_tags
from .sharded import ShardedEvaluator, make_mesh

__all__ = [
    "ShardedEvaluator",
    "init_distributed",
    "make_mesh",
    "partition_model",
    "partition_tags",
    "scenario_mesh",
]
