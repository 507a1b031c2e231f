from .mesh import make_mesh
from .commit import build_sharded_commit, build_sharded_evaluate, commit_batch
from .buckler import build_sharded_buckler_round
from .bigntt import ShardedBigNTT
from .prove import (shard_buckler_prover, shard_jindo_prover,
                    shard_jindo_verifier)
from .multihost import bcast_bytes, init_multihost, sync_global_devices

__all__ = ["make_mesh", "build_sharded_commit", "build_sharded_evaluate",
           "commit_batch", "build_sharded_buckler_round", "ShardedBigNTT",
           "shard_buckler_prover", "shard_jindo_prover",
           "shard_jindo_verifier", "init_multihost", "bcast_bytes",
           "sync_global_devices"]
