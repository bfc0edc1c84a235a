"""Legacy API names with deprecation warnings.

Parity with the reference's deprecated mutable API
(/root/reference/src/deprecated.jl:24-193): `variable`, `parameter`,
`objective`, `constraint`, `constraint_aug` (the `constraint!` analogue)
and `subexpr` forward to the modern `add_*` methods. Kept so models
written against ExaModels' original vocabulary port mechanically.
"""

from __future__ import annotations

import warnings

from .core import ExaCore

__all__ = [
    "variable",
    "parameter",
    "objective",
    "constraint",
    "constraint_aug",
    "subexpr",
]


def _warn(old: str, new: str):
    warnings.warn(
        f"{old}() is the legacy name; use ExaCore.{new}()",
        DeprecationWarning,
        stacklevel=3,
    )


def variable(core: ExaCore, *args, **kwargs):
    _warn("variable", "add_var")
    return core.add_var(*args, **kwargs)


def parameter(core: ExaCore, *args, **kwargs):
    _warn("parameter", "add_par")
    return core.add_par(*args, **kwargs)


def objective(core: ExaCore, *args, **kwargs):
    _warn("objective", "add_obj")
    return core.add_obj(*args, **kwargs)


def constraint(core: ExaCore, *args, **kwargs):
    _warn("constraint", "add_con")
    return core.add_con(*args, **kwargs)


def constraint_aug(core: ExaCore, con, *args, **kwargs):
    _warn("constraint_aug", "add_con_aug")
    return core.add_con_aug(con, *args, **kwargs)


def subexpr(core: ExaCore, *args, **kwargs):
    _warn("subexpr", "add_expr")
    return core.add_expr(*args, **kwargs)
