"""Frontend bridges (parity: the reference's L6 extension layer —
ext/ExaModelsMOI.jl, ext/ExaModelsJuMP.jl, ext/ExaModelsOptimalControl.jl)."""

from .flat import FlatCore, flat_model
from .linalg import (
    NodeArray,
    concat,
    cross,
    det,
    diag,
    diagm,
    dot,
    matmul,
    matvec,
    norm,
    trace,
)

__all__ = [
    "FlatCore",
    "flat_model",
    "NodeArray",
    "concat",
    "cross",
    "det",
    "diag",
    "diagm",
    "dot",
    "matmul",
    "matvec",
    "norm",
    "trace",
]
