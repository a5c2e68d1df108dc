"""Index implementations."""

from .exhaustive import ExhaustiveIndex

__all__ = ["ExhaustiveIndex"]
