"""Flat-model ingestion with pattern binning.

The reference re-SIMD-ifies arbitrary flat models coming from MOI/JuMP by
*binning* structurally identical expression trees into one pattern over a
tuple-data array (the `Bin` linked list + `_exafy` conversion of
/root/reference/ext/ExaModelsMOI.jl:26-59,384-402, surveyed in SURVEY.md
§2.7/§3.5). This module is that capability re-designed for our tracer:

  * the user declares objective terms and constraint rows ONE AT A TIME as
    plain scalar `Node` expressions over concrete variable indices
    (``x[17]**2 + 3.0*sin(x[4])``) — no generator/template required;
  * at `build()`, each expression is decomposed into top-level additive
    terms; each term is *skeletonized*: constants and variable/parameter
    indices become data slots, the operator tree becomes the bin key;
  * every bin becomes ONE SIMD pattern: constraints as a dims-only block +
    per-bin scatter-add augmentations (exactly the reference's
    one-`add_con` + per-bin-`add_con!` construction,
    ext/ExaModelsMOI.jl:384-392), objective terms as per-bin `add_obj`.

The result executes identically to a hand-written pattern model: thousands
of structurally-equal flat rows collapse to a handful of batched kernels.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

from ..core.graph import (
    Binary,
    Const,
    Data,
    NarySum,
    Node,
    ParamNode,
    Unary,
    VarNode,
    as_node,
    make_binary,
    make_unary,
    nary_sum,
)
from ..nlp.core import ExaCore
from ..nlp.model import ExaModel

__all__ = ["FlatCore", "flat_model"]

_INF = float("inf")


def _skeleton(node: Node, leaves: list) -> tuple:
    """Structural key of a flat expression; appends leaf values
    ('c'|'v'|'p', value) to `leaves` in deterministic preorder."""
    if isinstance(node, Const):
        leaves.append(("c", float(node.value)))
        return ("C",)
    if isinstance(node, VarNode):
        if not isinstance(node.index, Const):
            raise TypeError(
                "flat expressions must use concrete variable indices "
                "(x[3], not x[d.i]); use ExaCore templates for data-driven "
                "gathers"
            )
        leaves.append(("v", node.block, int(node.index.value)))
        return ("V",)
    if isinstance(node, ParamNode):
        if not isinstance(node.index, Const):
            raise TypeError("flat expressions must use concrete parameter indices")
        leaves.append(("p", node.block, int(node.index.value)))
        return ("P",)
    if isinstance(node, Unary):
        return ("u", node.op, _skeleton(node.a, leaves))
    if isinstance(node, Binary):
        return (
            "b",
            node.op,
            _skeleton(node.a, leaves),
            _skeleton(node.b, leaves),
        )
    if isinstance(node, NarySum):
        return ("s", len(node.children)) + tuple(
            _skeleton(c, leaves) for c in node.children
        )
    if isinstance(node, Data):
        raise TypeError(
            "flat expressions cannot contain data-element leaves; they are "
            "standalone scalar expressions"
        )
    raise TypeError(f"unsupported node in flat expression: {type(node).__name__}")


def _rebuild(node: Node, t, counter: list, var_handles, par_handles) -> Node:
    """Rebuild `node` with every leaf replaced by the next data slot of the
    element proxy `t` (counter[0] tracks the slot cursor). Variable leaf
    slots hold *global* flat indices, so the gather is block-agnostic."""
    if isinstance(node, Const):
        k = counter[0]
        counter[0] += 1
        return t[k]
    if isinstance(node, VarNode):
        k = counter[0]
        counter[0] += 1
        return VarNode(node.block, as_node(t[k]))
    if isinstance(node, ParamNode):
        k = counter[0]
        counter[0] += 1
        return ParamNode(node.block, as_node(t[k]))
    if isinstance(node, Unary):
        return make_unary(
            node.op, _rebuild(node.a, t, counter, var_handles, par_handles)
        )
    if isinstance(node, Binary):
        a = _rebuild(node.a, t, counter, var_handles, par_handles)
        b = _rebuild(node.b, t, counter, var_handles, par_handles)
        return make_binary(node.op, a, b)
    if isinstance(node, NarySum):
        return nary_sum(
            tuple(
                _rebuild(c, t, counter, var_handles, par_handles)
                for c in node.children
            )
        )
    raise TypeError(type(node).__name__)


def _additive_terms(node: Node, out: list, sign: float = 1.0):
    """Flatten top-level + / - / n-ary-sum chains into signed terms."""
    if isinstance(node, NarySum):
        for c in node.children:
            _additive_terms(c, out, sign)
        return
    if isinstance(node, Binary) and node.op == "add":
        _additive_terms(node.a, out, sign)
        _additive_terms(node.b, out, sign)
        return
    if isinstance(node, Binary) and node.op == "sub":
        _additive_terms(node.a, out, sign)
        _additive_terms(node.b, out, -sign)
        return
    if isinstance(node, Unary) and node.op == "neg":
        _additive_terms(node.a, out, -sign)
        return
    out.append(node if sign > 0 else make_unary("neg", node))


class FlatCore:
    """Builder for flat (row-at-a-time) models with automatic pattern
    binning. Variables/parameters are declared exactly as on `ExaCore`;
    objective terms and constraint rows are plain scalar expressions.

    >>> f = FlatCore()
    >>> x = f.add_var(10, start=1.0)
    >>> for i in range(9):
    ...     f.add_obj_expr(100.0 * (x[i+1] - x[i] ** 2) ** 2)
    >>> for i in range(8):
    ...     f.add_con_expr(x[i] * x[i+1] - 1.0, lcon=0.0, ucon=0.0)
    >>> model = f.build()   # 2 bins -> 2 SIMD patterns
    """

    def __init__(self, dtype=None, *, minimize: bool = True):
        self._core = ExaCore(dtype, minimize=minimize)
        self._obj_terms: list[Node] = []
        self._rows: list[tuple[Node, float, float]] = []
        self._built = False

    # -- declarations (delegated) ---------------------------------------
    def add_var(self, *args, **kw):
        return self._core.add_var(*args, **kw)

    def add_par(self, *args, **kw):
        return self._core.add_par(*args, **kw)

    # -- flat rows --------------------------------------------------------
    def add_obj_expr(self, expr) -> None:
        """Add a scalar term to the objective."""
        self._obj_terms.append(as_node(expr))

    def add_con_expr(self, expr, *, lcon=None, ucon=None) -> int:
        """Add one constraint row ``lcon <= expr <= ucon`` (bounds default
        to equality with 0, matching `ExaCore.add_con`). Returns the row
        index."""
        lc = 0.0 if lcon is None else float(lcon)
        uc = 0.0 if ucon is None else float(ucon)
        self._rows.append((as_node(expr), lc, uc))
        return len(self._rows) - 1

    # -- binning + build ---------------------------------------------------
    def _bin_terms(self, tagged_terms):
        """tagged_terms: iterable of (row_or_None, term_node).
        Returns {skeleton: (representative_node, [(row, leafvals), ...])}."""
        bins: dict = {}
        for row, term in tagged_terms:
            leaves: list = []
            key = _skeleton(term, leaves)
            vals = tuple(lv[-1] for lv in leaves)
            rep, rows = bins.setdefault(key, (term, []))
            rows.append((row, vals))
        return bins

    def to_core(self) -> ExaCore:
        """Bin all recorded rows/terms into SIMD patterns on the underlying
        ExaCore (idempotent-unsafe: call once)."""
        if self._built:
            raise RuntimeError("FlatCore.build()/to_core() already called")
        self._built = True
        c = self._core

        # ---- constraints: dims-only block + per-bin augmentations --------
        if self._rows:
            m = len(self._rows)
            lcon = np.empty(m)
            ucon = np.empty(m)
            tagged = []
            for r, (expr, lc, uc) in enumerate(self._rows):
                terms: list = []
                _additive_terms(expr, terms)
                for tm in terms:
                    # constants are terms too: they skeletonize to ("C",)
                    # and collapse into one (row, value) pattern, keeping
                    # cons(x) identical to the hand-written model
                    tagged.append((r, tm))
                lcon[r] = lc
                ucon[r] = uc
            block = c.add_con(shape=m, lcon=lcon, ucon=ucon, name="flat")
            for key, (rep, rows) in self._bin_terms(tagged).items():
                data = [(r,) + vals for r, vals in rows]

                def tmpl(t, rep=rep, nleaf=len(data[0]) - 1):
                    counter = [1]  # slot 0 is the target row
                    node = _rebuild(rep, t, counter, None, None)
                    return (t[0], node)

                c.add_con_aug(block, tmpl, data)

        # ---- objective: per-bin add_obj -----------------------------------
        obj_tagged = []
        for expr in self._obj_terms:
            terms: list = []
            _additive_terms(expr, terms)
            for tm in terms:
                obj_tagged.append((None, tm))
        for key, (rep, rows) in self._bin_terms(obj_tagged).items():
            data = [vals for _r, vals in rows]

            def tmpl(t, rep=rep):
                counter = [0]
                return _rebuild(rep, t, counter, None, None)

            c.add_obj(tmpl, data)
        return c

    def build(self, **kw) -> ExaModel:
        return ExaModel(self.to_core(), **kw)

    @property
    def nrows(self) -> int:
        return len(self._rows)

    def __repr__(self):
        return (
            f"FlatCore({self._core.nvar} vars, {len(self._rows)} flat rows, "
            f"{len(self._obj_terms)} objective terms)"
        )


def flat_model(build_fn, dtype=None, **kw) -> ExaModel:
    """Convenience: ``flat_model(lambda f: ...)`` — run the declaration
    function against a fresh FlatCore and build."""
    f = FlatCore(dtype, **kw)
    build_fn(f)
    return f.build()
