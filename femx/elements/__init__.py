"""femx.elements — batched element kernels (Timoshenko beam, Tetra10 solid)."""

from femx.elements import beam, tet10

__all__ = ["beam", "tet10"]
