"""Two-stage stochastic-program structure (parity: /root/reference/src/
two_stage.jl). First-stage (design) components are shared; second-stage
(recourse) components declared with `EachScenario()` are replicated per
scenario with scenario-major memory layout (the row-major equivalent of the
reference's trailing-scenario-dimension column-major layout,
two_stage.jl:122-137), so contiguous block-sharding of the element axis IS
scenario sharding — `ShardedEvaluator` over a "scen" mesh axis gives
scenario-parallel evaluation with psum-reduced first-stage coupling
(SURVEY.md §2.5: "this layer is where real multi-host parallelism lives").
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

from .core import Constraint, ExaCore, Parameter, Variable
from .model import ExaModel

__all__ = [
    "EachScenario",
    "TwoStageCore",
    "TwoStageModel",
    "get_nscen",
    "get_var_scen",
    "get_con_scen",
    "scenario_values",
    "set_scenario_values",
    "get_scenario_start",
    "set_scenario_start",
    "get_scenario_lvar",
    "set_scenario_lvar",
    "get_scenario_uvar",
    "set_scenario_uvar",
    "get_scenario_y0",
    "set_scenario_y0",
    "get_scenario_lcon",
    "set_scenario_lcon",
    "get_scenario_ucon",
    "set_scenario_ucon",
    "get_scenario_theta",
    "set_scenario_theta",
]


class EachScenario:
    """Marker: replicate the declaration per scenario
    (parity: two_stage.jl:20)."""


class TwoStageCore(ExaCore):
    """ExaCore carrying scenario structure: `nscen` plus per-variable and
    per-constraint scenario tags (0 = first stage / shared)."""

    def __init__(self, nscen: int, dtype=None, **kw):
        super().__init__(dtype, **kw)
        if nscen < 1:
            raise ValueError("nscen must be >= 1")
        self.nscen = int(nscen)
        self._var_scen: list[np.ndarray] = []
        self._con_scen: list[np.ndarray] = []
        self._par_scen: list[np.ndarray] = []

    # -- variables ----------------------------------------------------------
    def add_var(self, shape=(), *args, **kw) -> Variable:
        if isinstance(shape, EachScenario):
            return self._add_var_scen(*args, **kw)
        v = super().add_var(shape, *args, **kw)
        self._var_scen.append(np.zeros(v.size, dtype=np.int64))
        return v

    def _add_var_scen(self, shape=(), **kw) -> Variable:
        shape = (shape,) if isinstance(shape, (int, np.integer)) else tuple(shape)
        per = int(np.prod(shape)) if shape else 1
        # replicate bounds/starts per scenario when given per-scenario-block
        for key in ("start", "lvar", "uvar"):
            val = kw.get(key)
            if val is not None and not np.isscalar(val):
                arr = np.asarray(val, dtype=np.float64).reshape(-1)
                if arr.size == per:
                    kw[key] = np.tile(arr, self.nscen)
        v = super().add_var((self.nscen,) + shape, **kw)
        self._var_scen.append(
            np.repeat(np.arange(1, self.nscen + 1), per)
        )
        return v

    # -- parameters ---------------------------------------------------------
    def add_par(self, values, *args, **kw) -> Parameter:
        if isinstance(values, EachScenario):
            (inner,) = args if args else (kw.pop("values"),)
            arr = np.asarray(inner, dtype=np.float64)
            rep = np.broadcast_to(arr, (self.nscen,) + arr.shape).copy()
            p = super().add_par(rep, **kw)
            self._par_scen.append(
                np.repeat(np.arange(1, self.nscen + 1), max(1, arr.size))
            )
            return p
        p = super().add_par(values, *args, **kw)
        self._par_scen.append(np.zeros(p.size, dtype=np.int64))
        return p

    # -- constraints --------------------------------------------------------
    def add_con(self, template=None, data=None, *args, **kw) -> Constraint:
        if isinstance(template, EachScenario):
            real_data = args[0] if args else kw.pop("data", None)
            con = super().add_con(data, real_data, **kw)
            if con.n % self.nscen:
                raise ValueError(
                    f"EachScenario constraint rows ({con.n}) not divisible "
                    f"by nscen ({self.nscen}); iterate scenario-major"
                )
            self._con_scen.append(
                np.repeat(np.arange(1, self.nscen + 1), con.n // self.nscen)
            )
            return con
        con = super().add_con(template, data, **kw)
        self._con_scen.append(np.zeros(con.n, dtype=np.int64))
        return con

    def var_scen(self) -> np.ndarray:
        return (
            np.concatenate(self._var_scen)
            if self._var_scen
            else np.zeros(0, dtype=np.int64)
        )

    def par_scen(self) -> np.ndarray:
        return (
            np.concatenate(self._par_scen)
            if self._par_scen
            else np.zeros(0, dtype=np.int64)
        )

    def con_scen(self) -> np.ndarray:
        return (
            np.concatenate(self._con_scen)
            if self._con_scen
            else np.zeros(0, dtype=np.int64)
        )


class TwoStageModel(ExaModel):
    """ExaModel carrying the scenario tags of its TwoStageCore."""

    def __init__(self, core: TwoStageCore, **kw):
        super().__init__(core, **kw)
        self.nscen = core.nscen
        self._var_scen = core.var_scen()
        self._con_scen = core.con_scen()
        self._par_scen = core.par_scen()


def get_nscen(model) -> int:
    return model.nscen


def get_var_scen(model) -> np.ndarray:
    """Per-variable scenario index (0 = first stage)
    (parity: two_stage.jl:266-273)."""
    return model._var_scen


def get_con_scen(model) -> np.ndarray:
    return model._con_scen


def scenario_values(model, vec, scen: int, *, kind: str = "var") -> np.ndarray:
    """Slice a model-length vector to scenario `scen`'s components
    (parity: per-scenario getters, two_stage.jl:290-409). scen=0 gives the
    first-stage block."""
    tags = model._var_scen if kind == "var" else model._con_scen
    return np.asarray(vec)[tags == scen]


def set_scenario_values(model, vec, scen: int, values, *, kind: str = "var"):
    """Write scenario `scen`'s components of a model-length numpy vector."""
    tags = model._var_scen if kind == "var" else model._con_scen
    out = np.asarray(vec)
    out[tags == scen] = values
    return out


# ---------------------------------------------------------------------------
# Typed per-scenario getters/setters on model arrays
# (parity: /root/reference/src/two_stage.jl:290-409 — there they return
#  views into core arrays; here functional slices / masked replacement of
#  the model's immutable jax arrays. scen=0 addresses the first stage.)
# ---------------------------------------------------------------------------


def _scen_get(model, attr: str, scen: int, kind: str):
    tags = model._var_scen if kind == "var" else model._con_scen
    idx = np.flatnonzero(tags == scen)
    return getattr(model, attr)[idx]


def _scen_set(model, attr: str, scen: int, values, kind: str):
    import jax.numpy as jnp

    tags = model._var_scen if kind == "var" else model._con_scen
    idx = np.flatnonzero(tags == scen)
    vals = jnp.asarray(values, dtype=model.dtype).reshape(-1)
    if vals.shape[0] == 1 and idx.size != 1:
        vals = jnp.broadcast_to(vals, (idx.size,))
    if vals.shape[0] != idx.size:
        raise ValueError(
            f"scenario {scen}: expected {idx.size} values, got {vals.shape[0]}"
        )
    setattr(model, attr, getattr(model, attr).at[idx].set(vals))


def get_scenario_start(model, scen: int):
    """x0 slice of scenario `scen` (0 = first-stage block)."""
    return _scen_get(model, "x0", scen, "var")


def set_scenario_start(model, scen: int, values):
    _scen_set(model, "x0", scen, values, "var")


def get_scenario_lvar(model, scen: int):
    return _scen_get(model, "lvar", scen, "var")


def set_scenario_lvar(model, scen: int, values):
    _scen_set(model, "lvar", scen, values, "var")


def get_scenario_uvar(model, scen: int):
    return _scen_get(model, "uvar", scen, "var")


def set_scenario_uvar(model, scen: int, values):
    _scen_set(model, "uvar", scen, values, "var")


def get_scenario_y0(model, scen: int):
    return _scen_get(model, "y0", scen, "con")


def set_scenario_y0(model, scen: int, values):
    _scen_set(model, "y0", scen, values, "con")


def get_scenario_lcon(model, scen: int):
    return _scen_get(model, "lcon", scen, "con")


def set_scenario_lcon(model, scen: int, values):
    _scen_set(model, "lcon", scen, values, "con")


def get_scenario_ucon(model, scen: int):
    return _scen_get(model, "ucon", scen, "con")


def set_scenario_ucon(model, scen: int, values):
    _scen_set(model, "ucon", scen, values, "con")


def get_scenario_theta(model, scen: int):
    """θ slice of scenario `scen` over EachScenario parameters
    (parity: per-scenario θ views, two_stage.jl:366-409)."""
    tags = getattr(model, "_par_scen", None)
    if tags is None or len(tags) != model.theta.shape[0]:
        raise ValueError("model carries no per-parameter scenario tags")
    idx = np.flatnonzero(tags == scen)
    return model.theta[idx]


def set_scenario_theta(model, scen: int, values):
    import jax.numpy as jnp

    tags = getattr(model, "_par_scen", None)
    if tags is None or len(tags) != model.theta.shape[0]:
        raise ValueError("model carries no per-parameter scenario tags")
    idx = np.flatnonzero(tags == scen)
    vals = jnp.asarray(values, dtype=model.dtype).reshape(-1)
    if vals.shape[0] != idx.size:
        raise ValueError(
            f"scenario {scen}: expected {idx.size} values, got {vals.shape[0]}"
        )
    model.theta = model.theta.at[idx].set(vals)
