"""Binary indexes: SimHash/PCA/sign binarisation + RaBitQ."""

from .binariser import Binariser
from .flat import ExhaustiveIndexBinary
from .ivf import IvfIndexBinary
from .rabitq import ExhaustiveIndexRaBitQ, IvfIndexRaBitQ, RaBitQEncoder
from .vec_store import DeviceVectorStore, MmapVectorStore

__all__ = [
    "Binariser",
    "ExhaustiveIndexBinary",
    "IvfIndexBinary",
    "DeviceVectorStore",
    "MmapVectorStore",
    "RaBitQEncoder",
    "ExhaustiveIndexRaBitQ",
    "IvfIndexRaBitQ",
]
