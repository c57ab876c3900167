"""femx.parallel — multi-device sharding (element/DOF/batch parallelism)."""

from femx.parallel.halo import (
    DistributedMultigrid,
    HaloStructuredOperator,
    pcg_halo,
)
from femx.parallel.ops import (
    ShardedSolidOperator,
    batched_solve_cg,
    device_mesh,
    pad_elements,
)
from femx.parallel.structured import ShardedStructuredOperator

__all__ = [
    "DistributedMultigrid",
    "HaloStructuredOperator",
    "pcg_halo",
    "ShardedSolidOperator",
    "ShardedStructuredOperator",
    "batched_solve_cg",
    "device_mesh",
    "pad_elements",
]
