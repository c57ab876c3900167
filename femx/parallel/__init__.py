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
from femx.parallel.tg_sharded import ShardedTGOperator, pcg_tg_sharded
from femx.parallel.tg_lattice import DistributedUnstructuredSolver
from femx.parallel.modal import modal_shift_invert_halo

__all__ = [
    "DistributedMultigrid",
    "DistributedUnstructuredSolver",
    "HaloStructuredOperator",
    "ShardedTGOperator",
    "pcg_halo",
    "pcg_tg_sharded",
    "modal_shift_invert_halo",
    "ShardedSolidOperator",
    "ShardedStructuredOperator",
    "batched_solve_cg",
    "device_mesh",
    "pad_elements",
]
