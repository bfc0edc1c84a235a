"""User-facing scalar math for templates.

Each registered operator gets a dispatcher: on `Node` arguments it extends
the expression tree; on plain numbers it evaluates numerically (NumPy), so
templates and ordinary host code can share formulas.

`from examodels_tpu import *` brings these into scope (sin, cos, exp, ...).
Reductions `esum` / `eprod` are the analogues of `exa_sum` / `exa_prod`
(/root/reference/src/specialization.jl:204-298): inner reductions over
*concrete* (trace-time) iterables.
"""

from __future__ import annotations

import numpy as np

from . import graph as _g
from .graph import Node, nary_prod, nary_sum

_NUMERIC_FALLBACK = {
    "neg": lambda x: -x,
    "abs": np.abs,
    "abs2": np.square,
    "square": np.square,
    "inv": lambda x: 1.0 / x,
    "exp10": lambda x: 10.0**x,
    "csc": lambda x: 1.0 / np.sin(x),
    "sec": lambda x: 1.0 / np.cos(x),
    "cot": lambda x: np.cos(x) / np.sin(x),
    "acsc": lambda x: np.arcsin(1.0 / x),
    "asec": lambda x: np.arccos(1.0 / x),
    "acot": lambda x: np.arctan(1.0 / x),
    "csch": lambda x: 1.0 / np.sinh(x),
    "sech": lambda x: 1.0 / np.cosh(x),
    "coth": lambda x: np.cosh(x) / np.sinh(x),
    "acsch": lambda x: np.arcsinh(1.0 / x),
    "asech": lambda x: np.arccosh(1.0 / x),
    "acoth": lambda x: np.arctanh(1.0 / x),
    "sind": lambda x: np.sin(np.deg2rad(x)),
    "cosd": lambda x: np.cos(np.deg2rad(x)),
    "tand": lambda x: np.tan(np.deg2rad(x)),
    "logit": lambda x: np.log(x / (1.0 - x)),
    "sigmoid": lambda x: 1.0 / (1.0 + np.exp(-x)),
}

_NP_NAME = {
    "asin": "arcsin", "acos": "arccos", "atan": "arctan",
    "asinh": "arcsinh", "acosh": "arccosh", "atanh": "arctanh",
    "atan2": "arctan2", "max": "maximum", "min": "minimum",
    "gammaln": None, "loggamma": None, "digamma": None, "gamma": None,
    "erf": None, "erfc": None, "erfinv": None,
    "besseli0": None, "besseli1": None, "i0e": None, "i1e": None,
    "beta": None, "logbeta": None, "logaddexp": "logaddexp",
}


def _numeric_fn(name):
    if name in _NUMERIC_FALLBACK:
        return _NUMERIC_FALLBACK[name]
    npname = _NP_NAME.get(name, name)
    if npname is not None and hasattr(np, npname):
        return getattr(np, npname)
    try:  # special functions via scipy on host
        from scipy import special as sps

        table = {
            "erf": sps.erf, "erfc": sps.erfc, "erfinv": sps.erfinv,
            "gammaln": sps.gammaln, "loggamma": sps.gammaln,
            "digamma": sps.digamma, "gamma": sps.gamma,
            "besseli0": sps.i0, "besseli1": sps.i1,
            "i0e": sps.i0e, "i1e": sps.i1e,
            "beta": sps.beta, "logbeta": sps.betaln,
        }
        if name in table:
            return table[name]
    except ImportError:
        pass
    return None


def _make_unary_dispatch(name):
    nfn = _numeric_fn(name)

    def f(x):
        if isinstance(x, Node):
            return _g.make_unary(name, x)
        if nfn is None:
            raise TypeError(f"{name} has no numeric fallback; pass a Node")
        return nfn(x)

    f.__name__ = name
    return f


def _make_binary_dispatch(name):
    nfn = _numeric_fn(name)

    def f(a, b):
        if isinstance(a, Node) or isinstance(b, Node):
            return _g.make_binary(name, a, b)
        if nfn is None:
            raise TypeError(f"{name} has no numeric fallback; pass a Node")
        return nfn(a, b)

    f.__name__ = name
    return f


_RESERVED = {"add", "sub", "mul", "div", "pow", "neg", "mod", "floordiv"}

__all__ = ["esum", "eprod"]

for _name in _g.UNIVARIATE_OPS:
    if _name in _RESERVED:
        continue
    globals()[_name] = _make_unary_dispatch(_name)
    __all__.append(_name)

for _name in _g.BIVARIATE_OPS:
    if _name in _RESERVED:
        continue
    _pub = _name + "_" if _name in ("max", "min") else _name
    globals()[_pub] = _make_binary_dispatch(_name)
    __all__.append(_pub)


def esum(terms) -> Node:
    """Inner sum over a concrete (trace-time) iterable of expressions.

    `esum(x[d.i + k] for k in range(3))` unrolls at trace into one shallow
    n-ary node — the analogue of `sum(...)` in reference templates
    (/root/reference/src/specialization.jl:253-298).
    """
    return nary_sum(terms)


def eprod(terms) -> Node:
    return nary_prod(terms)
