from .distributed import init_distributed, scenario_mesh
from .sharded import ShardedEvaluator, make_mesh

__all__ = [
    "ShardedEvaluator",
    "init_distributed",
    "make_mesh",
    "scenario_mesh",
]
