from .sharded import ShardedEvaluator, make_mesh

__all__ = ["ShardedEvaluator", "make_mesh"]
