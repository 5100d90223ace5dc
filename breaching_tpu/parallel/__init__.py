from .federated import sharded_user_aggregate
from .mesh import (
    make_attack_mesh,
    make_mesh,
    params_partition_specs,
    shard_pytree,
    sharded_attack_step,
)

__all__ = ["make_attack_mesh", "make_mesh", "params_partition_specs",
           "shard_pytree", "sharded_attack_step", "sharded_user_aggregate"]
