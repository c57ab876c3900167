"""femx.parallel — multi-device sharding (element/DOF/batch parallelism)."""

from femx.parallel.ops import (
    ShardedSolidOperator,
    batched_solve_cg,
    device_mesh,
    pad_elements,
)

__all__ = ["ShardedSolidOperator", "batched_solve_cg", "device_mesh", "pad_elements"]
