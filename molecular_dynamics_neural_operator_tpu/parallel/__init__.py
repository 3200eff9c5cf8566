from molecular_dynamics_neural_operator_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    make_sharded_train_step,
    make_sharded_curriculum_train_step,
)
from molecular_dynamics_neural_operator_tpu.parallel.rollout_sharded import (
    make_sharded_rollout_fn,
)
from molecular_dynamics_neural_operator_tpu.parallel.rollout_edge_sharded import (
    make_edge_sharded_rollout_fn,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "make_sharded_train_step",
    "make_sharded_curriculum_train_step",
    "make_sharded_rollout_fn",
    "make_edge_sharded_rollout_fn",
]
