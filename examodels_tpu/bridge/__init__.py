"""Frontend bridges (parity: the reference's L6 extension layer —
ext/ExaModelsMOI.jl, ext/ExaModelsJuMP.jl, ext/ExaModelsOptimalControl.jl)."""

from .flat import FlatCore, flat_model
from .nl import nl_flatcore, nl_model, read_nl
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
    "nl_flatcore",
    "nl_model",
    "read_nl",
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
