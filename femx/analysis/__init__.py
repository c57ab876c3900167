"""femx.analysis — end-to-end pipelines.

Beam frames and solid reactions are the reference's two implemented
products; plane (2D static), pipe thermal, and shaft modal implement the
reference launcher's three placeholder entries for real (FEM_main.py:412-431).
"""

from femx.analysis.beam import BeamAnalysis, BeamResults
from femx.analysis.pipe import PipeThermalAnalysis
from femx.analysis.plane import PlaneAnalysis
from femx.analysis.shaft import ShaftModalAnalysis, ShaftMode
from femx.analysis.solid import ForceAnalysis, SolidReactionAnalysis

__all__ = [
    "BeamAnalysis",
    "BeamResults",
    "ForceAnalysis",
    "PipeThermalAnalysis",
    "PlaneAnalysis",
    "ShaftModalAnalysis",
    "ShaftMode",
    "SolidReactionAnalysis",
]
