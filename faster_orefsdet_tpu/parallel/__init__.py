from .mesh import make_mesh
from .train_dp import build_dp_train_step, replicate_state, shard_batch

__all__ = ["make_mesh", "build_dp_train_step", "replicate_state", "shard_batch"]
