"""femx.analysis — end-to-end pipelines (beam frames, solid reactions)."""

from femx.analysis.beam import BeamAnalysis, BeamResults
from femx.analysis.solid import ForceAnalysis, SolidReactionAnalysis

__all__ = ["BeamAnalysis", "BeamResults", "ForceAnalysis", "SolidReactionAnalysis"]
