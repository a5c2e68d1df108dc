"""Index implementations."""

from .exhaustive import ExhaustiveIndex
from .ivf import IvfIndex

__all__ = ["ExhaustiveIndex", "IvfIndex"]
