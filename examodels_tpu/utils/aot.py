"""Ahead-of-time compiled model archives.

Capability parity with the reference's AOT story (JuliaCTest:
`juliac --trim=safe` compiles model apps into native executables,
/root/reference/test/JuliaCTest/JuliaCTest.jl): a frozen ExaModel's oracle
programs are exported as StableHLO via `jax.export` and written — together
with the static structure arrays, bounds, and meta — into a single archive.
A consumer process can `load_model(path)` and evaluate / solve WITHOUT the
builder, the tracer, or the original model code: deserialization skips
tracing entirely and compiles the stored StableHLO directly.

Format: a zip (npz-style) with
  meta.json                 — sizes, dtype, minimize, export platforms
  arrays.npz                — x0/bounds/y0/lcon/ucon/theta + COO structures
  fn_<name>.bin             — serialized jax.export.Exported per oracle
"""

from __future__ import annotations

import io
import json
import zipfile
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["save_model", "load_model", "AOTModel"]

_ORACLES = (
    "obj", "cons", "grad", "jac_coord", "hess_coord", "hess_jac_coord",
    "jprod", "jtprod", "hprod",
)


def _specs(model, name):
    dt = model.dtype
    x = jax.ShapeDtypeStruct((model.nvar,), dt)
    y = jax.ShapeDtypeStruct((model.ncon,), dt)
    th = jax.ShapeDtypeStruct((model.npar,), dt)
    w = jax.ShapeDtypeStruct((), dt)
    v = jax.ShapeDtypeStruct((model.nvar,), dt)
    if name in ("obj", "cons", "grad", "jac_coord"):
        return (x, th)
    if name in ("hess_coord", "hess_jac_coord"):
        return (x, y, w, th)
    if name in ("jprod",):
        return (x, v, th)
    if name in ("jtprod",):
        return (x, y, th)
    if name in ("hprod",):
        return (x, y, v, w, th)
    raise KeyError(name)


def _impl(model, name):
    st = model._static
    impls = {
        "obj": lambda x, th: model._obj_impl(st, x, th),
        "cons": lambda x, th: model._cons_impl(st, x, th),
        "grad": lambda x, th: model._grad_impl(st, x, th),
        "jac_coord": lambda x, th: model._jac_impl(st, x, th),
        "hess_coord": lambda x, y, w, th: model._hess_impl(st, x, y, w, th),
        "hess_jac_coord": lambda x, y, w, th: model._hess_jac_impl(st, x, y, w, th),
        "jprod": lambda x, v, th: model._jprod_impl(st, x, v, th),
        "jtprod": lambda x, v, th: model._jtprod_impl(st, x, v, th),
        "hprod": lambda x, y, v, w, th: model._hprod_impl(st, x, y, v, w, th),
    }
    return impls[name]


def save_model(model, path: str, *, platforms: Optional[list] = None,
               oracles=_ORACLES) -> None:
    """Export the model's jitted oracle programs + static data to `path`.

    `platforms` defaults to the current default backend; pass e.g.
    ["cpu", "tpu"] for a multi-platform archive.
    """
    from jax import export as jexport

    plats = platforms or [jexport.default_export_platform()]
    meta = dict(
        nvar=model.nvar, ncon=model.ncon, npar=model.npar,
        nnzj=model.nnzj, nnzh=model.nnzh, nnzg=getattr(model, "nnzg", 0),
        dtype=model.dtype.name, minimize=bool(model.minimize),
        platforms=list(plats), oracles=list(oracles),
    )
    jr, jc = model.jac_structure()
    hr, hc = model.hess_structure()
    arrays = dict(
        x0=np.asarray(model.x0), lvar=np.asarray(model.lvar),
        uvar=np.asarray(model.uvar), y0=np.asarray(model.y0),
        lcon=np.asarray(model.lcon), ucon=np.asarray(model.ucon),
        theta=np.asarray(model.theta),
        jac_rows=np.asarray(jr), jac_cols=np.asarray(jc),
        hess_rows=np.asarray(hr), hess_cols=np.asarray(hc),
    )

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("meta.json", json.dumps(meta))
        buf = io.BytesIO()
        np.savez(buf, **arrays)
        z.writestr("arrays.npz", buf.getvalue())
        for name in oracles:
            exp = jexport.export(
                jax.jit(_impl(model, name)), platforms=plats
            )(*_specs(model, name))
            z.writestr(f"fn_{name}.bin", exp.serialize())


class AOTModel:
    """A loaded AOT archive: the same oracle surface as ExaModel (obj, cons,
    grad, jac_coord, hess_coord, hess_jac_coord, jprod, jtprod, hprod,
    jac_structure, hess_structure, meta arrays) without any tracing."""

    def __init__(self, meta: dict, arrays: dict, fns: dict):
        self.nvar = meta["nvar"]
        self.ncon = meta["ncon"]
        self.npar = meta["npar"]
        self.nnzj = meta["nnzj"]
        self.nnzh = meta["nnzh"]
        self.nnzg = meta.get("nnzg", 0)
        self.minimize = meta["minimize"]
        self.dtype = jnp.dtype(meta["dtype"])
        self.platforms = meta["platforms"]
        dt = self.dtype
        for k in ("x0", "lvar", "uvar", "y0", "lcon", "ucon", "theta"):
            setattr(self, k, jnp.asarray(arrays[k], dtype=dt))
        self._jac_rows = arrays["jac_rows"]
        self._jac_cols = arrays["jac_cols"]
        self._hess_rows = arrays["hess_rows"]
        self._hess_cols = arrays["hess_cols"]
        self._fns = fns

    # -- structure -----------------------------------------------------------
    def jac_structure(self):
        return self._jac_rows, self._jac_cols

    def hess_structure(self):
        return self._hess_rows, self._hess_cols

    # -- oracles --------------------------------------------------------------
    def _x(self, v):
        return jnp.asarray(v, dtype=self.dtype)

    def _th(self, theta):
        return self.theta if theta is None else self._x(theta)

    def _y(self, y):
        return jnp.zeros(self.ncon, dtype=self.dtype) if y is None else self._x(y)

    def obj(self, x, *, theta=None):
        return self._fns["obj"](self._x(x), self._th(theta))

    def cons(self, x, *, theta=None):
        return self._fns["cons"](self._x(x), self._th(theta))

    def grad(self, x, *, theta=None):
        return self._fns["grad"](self._x(x), self._th(theta))

    def jac_coord(self, x, *, theta=None):
        return self._fns["jac_coord"](self._x(x), self._th(theta))

    def hess_coord(self, x, y=None, *, obj_weight=1.0, theta=None):
        return self._fns["hess_coord"](
            self._x(x), self._y(y), jnp.asarray(obj_weight, self.dtype),
            self._th(theta),
        )

    def hess_jac_coord(self, x, y=None, *, obj_weight=1.0, theta=None):
        return self._fns["hess_jac_coord"](
            self._x(x), self._y(y), jnp.asarray(obj_weight, self.dtype),
            self._th(theta),
        )

    def jprod(self, x, v, *, theta=None):
        return self._fns["jprod"](self._x(x), self._x(v), self._th(theta))

    def jtprod(self, x, v, *, theta=None):
        return self._fns["jtprod"](self._x(x), self._x(v), self._th(theta))

    def hprod(self, x, y, v, *, obj_weight=1.0, theta=None):
        return self._fns["hprod"](
            self._x(x), self._y(y), self._x(v),
            jnp.asarray(obj_weight, self.dtype), self._th(theta),
        )

    # -- traceable internal oracle interface -----------------------------------
    # The IPM drives models through `model._*_impl(model._static, ...)`
    # (solver/ipm.py) so its programs stay retrace-free; exported calls are
    # jit-composable, so the AOT model can duck-type that interface with a
    # null static pytree.
    _static = None

    def _obj_impl(self, st, x, theta):
        return self._fns["obj"](x, theta)

    def _cons_impl(self, st, x, theta):
        return self._fns["cons"](x, theta)

    def _grad_impl(self, st, x, theta):
        return self._fns["grad"](x, theta)

    def _jac_impl(self, st, x, theta):
        return self._fns["jac_coord"](x, theta)

    def _hess_impl(self, st, x, y, obj_weight, theta):
        return self._fns["hess_coord"](x, y, obj_weight, theta)

    def _hess_jac_impl(self, st, x, y, obj_weight, theta):
        return self._fns["hess_jac_coord"](x, y, obj_weight, theta)

    def _jprod_impl(self, st, x, v, theta):
        return self._fns["jprod"](x, v, theta)

    def _jtprod_impl(self, st, x, v, theta):
        return self._fns["jtprod"](x, v, theta)

    def _hprod_impl(self, st, x, y, v, obj_weight, theta):
        return self._fns["hprod"](x, y, v, obj_weight, theta)

    def __repr__(self):
        return (
            f"AOTModel(nvar={self.nvar}, ncon={self.ncon}, nnzj={self.nnzj}, "
            f"nnzh={self.nnzh}, platforms={self.platforms})"
        )


def load_model(path: str) -> AOTModel:
    """Load an AOT archive written by save_model. No tracing happens; the
    stored StableHLO compiles directly on first call."""
    from jax import export as jexport

    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read("meta.json"))
        with np.load(io.BytesIO(z.read("arrays.npz"))) as npz:
            arrays = {k: npz[k] for k in npz.files}
        fns = {}
        for name in meta["oracles"]:
            exp = jexport.deserialize(z.read(f"fn_{name}.bin"))
            fns[name] = jax.jit(exp.call)
    return AOTModel(meta, arrays, fns)
