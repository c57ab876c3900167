"""femx.sections — parametric cross-section geometry and properties."""

from femx.sections.geometry import SectionGeometry, build_geometry
from femx.sections.properties import (
    SectionProperties,
    calculate_section_properties,
    compute_properties,
    polygon_moments,
    torsion_rectangle,
)

__all__ = [
    "SectionGeometry",
    "build_geometry",
    "SectionProperties",
    "calculate_section_properties",
    "compute_properties",
    "polygon_moments",
    "torsion_rectangle",
]
