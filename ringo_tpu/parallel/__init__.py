from .mesh import make_mesh
from .commit import build_sharded_commit, build_sharded_evaluate, commit_batch

__all__ = ["make_mesh", "build_sharded_commit", "build_sharded_evaluate",
           "commit_batch"]
