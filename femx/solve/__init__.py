"""femx.solve — dense direct and iterative (PCG) linear solvers."""

from femx.solve.cg import CGResult, pcg, pcg_refined
from femx.solve.dense import partitioned_solve, solve_dense

__all__ = ["CGResult", "pcg", "pcg_refined", "partitioned_solve", "solve_dense"]
