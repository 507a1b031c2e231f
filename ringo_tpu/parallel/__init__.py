from .mesh import make_mesh
from .commit import build_sharded_commit, build_sharded_evaluate, commit_batch
from .buckler import build_sharded_buckler_round
from .bigntt import ShardedBigNTT

__all__ = ["make_mesh", "build_sharded_commit", "build_sharded_evaluate",
           "commit_batch", "build_sharded_buckler_round", "ShardedBigNTT"]
