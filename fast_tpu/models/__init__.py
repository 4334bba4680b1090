"""Analytic atmosphere / AO models (L1+L2 of the reference layer map)."""

from . import atmosphere
from . import ao
from . import scintillation

__all__ = ["atmosphere", "ao", "scintillation"]
