from .mesh import (
    make_mesh,
    params_partition_specs,
    shard_pytree,
    sharded_attack_step,
)

__all__ = ["make_mesh", "params_partition_specs", "shard_pytree", "sharded_attack_step"]
