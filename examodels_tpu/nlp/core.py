"""ExaCore — the model builder (parity: /root/reference/src/nlp.jl:261-1334).

The builder accumulates variable/parameter blocks and traced patterns; then
`ExaModel(core)` freezes everything into static COO structures + jitted
oracle methods (model.py).

API sketch (0-based indexing, row-major multi-dim layout):

    core = ExaCore()
    x = core.add_var(N, start=..., lvar=..., uvar=...)
    th = core.add_par(values)
    core.add_obj(lambda i: 100*(x[i-1]**2 - x[i])**2 + (x[i-1]-1)**2,
                 range(1, N))
    con = core.add_con(lambda i: 3*x[i+1]**3 + 2*x[i+2] - 5, range(N-2))
    core.add_con_aug(con, lambda i: (i, sin(x[i+1]-x[i+2])), range(N-2))
    model = ExaModel(core)

Templates receive one symbolic element proxy; variable handles are indexed
with data fields / integer arithmetic.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import numpy as np

from ..core.compile import CompiledPattern, DataTable, trace_pattern
from ..core.graph import Const, Data, Node, ParamNode, VarNode, as_node, make_binary


def _ravel_index(idx, shape, kind: str, offset: int) -> Node:
    """Row-major flatten of a (possibly symbolic) multi-index into a flat
    global index node. Bounds on concrete ints checked here; data-dependent
    indices are checked at build time (eval_index + range check)."""
    if not isinstance(idx, tuple):
        idx = (idx,)
    if len(idx) != len(shape):
        raise IndexError(
            f"{kind} expects {len(shape)} indices, got {len(idx)}"
        )
    flat: Node = Const(0)
    for k, (i, dim) in enumerate(zip(idx, shape)):
        if isinstance(i, (int, np.integer)):
            i = int(i)
            if i < 0:
                i += dim
            if not 0 <= i < dim:
                raise IndexError(
                    f"index {i} out of bounds for {kind} axis {k} with size {dim}"
                )
            i_node: Node = Const(i)
        elif isinstance(i, Node):
            i_node = i
        else:
            raise TypeError(
                f"{kind} index must be an int or a symbolic Node, got "
                f"{type(i).__name__}"
            )
        flat = make_binary("add", make_binary("mul", flat, Const(dim)), i_node)
    return make_binary("add", Const(offset), flat)


class Variable:
    """Handle to a contiguous block of decision variables."""

    def __init__(self, core, vid: int, offset: int, shape: tuple, name: str):
        self._core = core
        self.vid = vid
        self.offset = offset
        self.shape = shape
        self.size = int(np.prod(shape)) if shape else 1
        self.name = name

    def __getitem__(self, idx) -> VarNode:
        if not self.shape:
            raise IndexError(f"variable {self.name!r} is a scalar; use var[()]")
        return VarNode(self.vid, _ravel_index(idx, self.shape, f"variable {self.name!r}", self.offset))

    def node(self) -> VarNode:
        """The scalar variable itself (for 0-d blocks)."""
        return VarNode(self.vid, Const(self.offset))

    def __repr__(self):
        return f"Variable({self.name!r}, shape={self.shape}, offset={self.offset})"


class Parameter:
    """Handle to a block of parameters (values mutable post-build without
    re-tracing; parity: add_par/set_parameter!, /root/reference/src/nlp.jl:748-827)."""

    def __init__(self, core, pid: int, offset: int, shape: tuple, name: str):
        self._core = core
        self.pid = pid
        self.offset = offset
        self.shape = shape
        self.size = int(np.prod(shape)) if shape else 1
        self.name = name

    def __getitem__(self, idx) -> ParamNode:
        if not self.shape:
            raise IndexError(f"parameter {self.name!r} is a scalar")
        return ParamNode(self.pid, _ravel_index(idx, self.shape, f"parameter {self.name!r}", self.offset))

    def node(self) -> ParamNode:
        return ParamNode(self.pid, Const(self.offset))

    def __repr__(self):
        return f"Parameter({self.name!r}, shape={self.shape}, offset={self.offset})"


@dataclass
class Objective:
    pattern: CompiledPattern
    name: str = "obj"

    def __repr__(self):
        from ..core.prettyprint import abbrev, node_str

        return (
            f"Objective {self.name}: sum of {abbrev(node_str(self.pattern.tree))} "
            f"over {self.pattern.n} elements"
        )


@dataclass
class Constraint:
    """Handle to a block of constraint rows."""

    offset: int  # first row
    n: int  # number of rows
    shape: tuple
    pattern: Optional[CompiledPattern]  # None for dims-only (empty) blocks
    name: str = "con"

    def row_index_node(self, idx) -> Node:
        """Flat row index (0-based within this block) from a possibly
        multi-dim, possibly symbolic index — used by conaug targets."""
        return _ravel_index(idx, self.shape, f"constraint {self.name!r}", 0)

    def __getitem__(self, idx) -> "ConSlot":
        """Conaug sugar: `con[i] + expr` inside an add_con_aug template is
        the pair `(i, expr)` (the Python rendering of the reference's
        `g[i] += expr` generator form, /root/reference/src/nlp.jl:202-245)."""
        return ConSlot(self, idx)

    def __repr__(self):
        from ..core.prettyprint import abbrev, node_str

        body = (
            node_str(self.pattern.tree) if self.pattern is not None else "<empty>"
        )
        return (
            f"Constraint {self.name} [{self.offset}:{self.offset + self.n}]: "
            f"{abbrev(body)} over {self.n} rows"
        )


class ConSlot:
    """A row of a Constraint block, awaiting an accumulated expression."""

    def __init__(self, con: Constraint, idx):
        self.con = con
        self.idx = idx

    def __add__(self, expr) -> "ConAugPair":
        return ConAugPair(self.con, self.idx, expr)

    def __sub__(self, expr) -> "ConAugPair":
        return ConAugPair(self.con, self.idx, as_node(expr) * -1.0)

    def __repr__(self):
        return f"ConSlot({self.con.name}[{self.idx}])"


class ConAugPair:
    """(target row, accumulated expr) produced by the `con[i] + expr` sugar."""

    def __init__(self, con: Constraint, idx, expr):
        self.con = con
        self.idx = idx
        self.expr = expr


@dataclass
class ConstraintAug:
    """Scatter-add augmentation of an existing constraint block
    (parity: add_con!, /root/reference/src/nlp.jl:1156-1284)."""

    con: Constraint
    pattern: CompiledPattern
    target_rows: np.ndarray  # (n,) global row indices
    name: str = "conaug"


class Expression:
    """Reduced subexpression: indexing inlines the traced tree into the
    consumer pattern via gathered data leaves
    (parity: add_expr, /root/reference/src/nlp.jl:1286-1334)."""

    def __init__(self, core, sid: int, template: Callable, table: DataTable,
                 shape: tuple, name: str):
        self._core = core
        self.sid = sid
        self.template = template
        self.table = table
        self.shape = shape
        self.name = name

    def __getitem__(self, idx) -> Node:
        flat = _ravel_index(idx, self.shape, f"expression {self.name!r}", 0)
        proxy = Data(self.sid, (), flat)
        out = self.template(proxy)
        return as_node(out)


def _broadcast_bound(value, n: int, default: float) -> np.ndarray:
    if value is None:
        return np.full(n, default, dtype=np.float64)
    if callable(value):
        raise TypeError("bounds must be scalars or arrays, not callables")
    arr = np.asarray(value, dtype=np.float64)
    if arr.ndim == 0:
        return np.full(n, float(arr), dtype=np.float64)
    arr = arr.reshape(-1)
    if arr.shape[0] != n:
        raise ValueError(f"bound/start array has length {arr.shape[0]}, expected {n}")
    return arr


class ExaCore:
    """Mutable model accumulator. The reference keeps an immutable functional
    core rebound by macros (/root/reference/src/nlp.jl:305-430); in Python the
    idiomatic equivalent is a builder object — all bookkeeping is identical.
    """

    def __init__(self, dtype: Any = None, *, minimize: bool = True, backend: Any = None):
        if dtype is None:
            import jax

            self.dtype = np.dtype(np.float64 if jax.config.jax_enable_x64 else np.float32)
        else:
            self.dtype = np.dtype(dtype)
        self.minimize = minimize
        self.backend = backend  # reserved: device/sharding hints

        self.nvar = 0
        self.npar = 0
        self.ncon = 0
        self.vars: list[Variable] = []
        self.pars: list[Parameter] = []
        self.objs: list[Objective] = []
        self.cons: list[Constraint] = []
        self.conaugs: list[ConstraintAug] = []
        self.exprs: list[Expression] = []
        self.oracles: list[tuple] = []  # (VectorNonlinearOracle, row_offset)
        self.scalar_oracles: list = []
        self.evals: list = []  # OracleEvaluator
        self.refs: dict[str, Any] = {}

        self._x0: list[np.ndarray] = []
        self._lvar: list[np.ndarray] = []
        self._uvar: list[np.ndarray] = []
        self._theta0: list[np.ndarray] = []
        self._y0: list[np.ndarray] = []
        self._lcon: list[np.ndarray] = []
        self._ucon: list[np.ndarray] = []

    # -- naming ------------------------------------------------------------
    def _register(self, name: Optional[str], obj, prefix: str):
        if name is None:
            name = f"{prefix}{len(self.refs)}"
        if name in self.refs:
            raise ValueError(f"name {name!r} already registered")
        self.refs[name] = obj
        return name

    def __getattr__(self, name):
        refs = self.__dict__.get("refs")
        if refs and name in refs:
            return refs[name]
        raise AttributeError(name)

    # -- extra tables for subexpression inlining ----------------------------
    def _extra_tables(self) -> dict:
        return {e.sid: e.table for e in self.exprs}

    def _trace(self, template, data) -> CompiledPattern:
        pat = trace_pattern(template, data, extra_tables=self._extra_tables())
        self._check_indices(pat)
        return pat

    def _check_indices(self, pat: CompiledPattern):
        """Build-time bounds check of data-dependent variable/parameter
        indices (analogue of /root/reference/src/nlp.jl:587-602)."""
        if pat.n == 0:
            return
        if pat.p and ((pat.vidx < 0).any() or (pat.vidx >= max(self.nvar, 1)).any()):
            bad = pat.vidx[(pat.vidx < 0) | (pat.vidx >= max(self.nvar, 1))]
            raise IndexError(
                f"variable index out of bounds in pattern: e.g. flat index "
                f"{int(bad.flat[0])} with nvar={self.nvar}"
            )
        if pat.q and ((pat.pidx < 0).any() or (pat.pidx >= max(self.npar, 1)).any()):
            raise IndexError("parameter index out of bounds in pattern")

    # -- builder methods -----------------------------------------------------
    def add_var(
        self,
        shape=(),
        data=None,
        *,
        start=0.0,
        lvar=-math.inf,
        uvar=math.inf,
        name: Optional[str] = None,
    ) -> Variable:
        if callable(shape):
            return self._add_var_lifted(
                shape, data, start=start, lvar=lvar, uvar=uvar, name=name
            )
        shape = (shape,) if isinstance(shape, (int, np.integer)) else tuple(shape)
        size = int(np.prod(shape)) if shape else 1
        v = Variable(self, len(self.vars), self.nvar, shape, name or f"x{len(self.vars)}")
        if name:
            self._register(name, v, "x")
        self.vars.append(v)
        self.nvar += size
        self._x0.append(_broadcast_bound(start, size, 0.0))
        self._lvar.append(_broadcast_bound(lvar, size, -math.inf))
        self._uvar.append(_broadcast_bound(uvar, size, math.inf))
        return v

    def _add_var_lifted(
        self, template, data, *, start, lvar, uvar, name
    ) -> Variable:
        """Generator form of add_var (parity: /root/reference/src/
        nlp.jl:939-957): creates one new variable per data element plus
        equality rows ``z_k - template(d_k) = 0`` tying them — a *lifted*
        subexpression (contrast add_expr, which inlines)."""
        items = list(data)
        n = len(items)
        z = self.add_var(n, start=start, lvar=lvar, uvar=uvar, name=name)
        self.add_con(
            lambda t: z[t[0]] - template(t[1]),
            list(enumerate(items)),
            name=(f"{name}_def" if name else None),
        )
        return z

    def add_par(self, values, *, shape=None, name: Optional[str] = None) -> Parameter:
        arr = np.asarray(values, dtype=np.float64)
        if shape is not None:
            shape = (shape,) if isinstance(shape, (int, np.integer)) else tuple(shape)
            arr = np.broadcast_to(arr, shape).astype(np.float64)
        p = Parameter(self, len(self.pars), self.npar, arr.shape, name or f"p{len(self.pars)}")
        if name:
            self._register(name, p, "p")
        self.pars.append(p)
        self.npar += arr.size
        self._theta0.append(arr.reshape(-1).copy())
        return p

    def add_obj(self, template, data=None, *, name: Optional[str] = None) -> Objective:
        pat = self._trace(template, data)
        o = Objective(pat, name or f"obj{len(self.objs)}")
        self.objs.append(o)
        return o

    def add_con(
        self,
        template=None,
        data=None,
        *,
        lcon=None,
        ucon=None,
        start=0.0,
        shape=None,
        name: Optional[str] = None,
    ) -> Constraint:
        """Three forms (parity: /root/reference/src/nlp.jl:1026-1151):
        template+data generator; bare Node (single row); dims-only
        (`template=None, shape=m`) empty block for later augmentation.
        Default bounds are equality to zero.
        """
        if template is None:
            if shape is None:
                raise ValueError("dims-only add_con requires shape=")
            shape = (shape,) if isinstance(shape, (int, np.integer)) else tuple(shape)
            n = int(np.prod(shape)) if shape else 1
            pat = None
        else:
            pat = self._trace(template, data)
            n = pat.n
            if shape is None:
                shape = (n,)
            else:
                shape = (shape,) if isinstance(shape, (int, np.integer)) else tuple(shape)
                if int(np.prod(shape)) != n:
                    raise ValueError("shape does not match number of elements")
        con = Constraint(self.ncon, n, shape, pat, name or f"c{len(self.cons)}")
        if name:
            self._register(name, con, "c")
        self.cons.append(con)
        self.ncon += n
        # each bound independently defaults to 0 (reference semantics: e.g.
        # `lcon=-Inf` with ucon unspecified gives g <= 0 — see the thermal
        # limit rows of the OPF benchmark model)
        lc = _broadcast_bound(lcon, n, 0.0)
        uc = _broadcast_bound(ucon, n, 0.0)
        self._y0.append(_broadcast_bound(start, n, 0.0))
        self._lcon.append(lc)
        self._ucon.append(uc)
        return con

    def add_con_aug(self, con: Constraint, template, data=None, *, name: Optional[str] = None) -> ConstraintAug:
        """Scatter-add augmentation: `template(d)` returns a pair
        `(row_index, expr)`; `expr` is accumulated into row `row_index`
        (0-based, possibly multi-dim tuple) of `con`
        (parity: add_con!, /root/reference/src/nlp.jl:1156-1284).
        """
        if con.pattern is None and con.n == 0:
            raise ValueError("cannot augment an empty 0-row constraint block")

        captured: dict = {}

        def wrapped(d):
            out = template(d)
            if isinstance(out, ConAugPair):
                if out.con is not con:
                    raise ValueError(
                        f"conaug template indexes constraint "
                        f"{out.con.name!r} but augments {con.name!r}"
                    )
                idx, expr = out.idx, out.expr
            elif isinstance(out, tuple) and len(out) == 2:
                idx, expr = out
            else:
                raise TypeError(
                    "conaug template must return a (row_index, expr) pair "
                    "or use the `con[i] + expr` sugar"
                )
            captured["row_node"] = con.row_index_node(idx)
            return as_node(expr)

        pat = self._trace(wrapped, data)
        from ..core.compile import eval_index

        table = DataTable.from_data(data)
        tables = {0: table}
        tables.update(self._extra_tables())
        rel_rows = eval_index(captured["row_node"], tables, pat.n).astype(np.int64)
        if pat.n and ((rel_rows < 0).any() or (rel_rows >= con.n).any()):
            raise IndexError(
                f"conaug target row out of bounds for constraint block of "
                f"{con.n} rows"
            )
        aug = ConstraintAug(con, pat, con.offset + rel_rows, name or f"aug{len(self.conaugs)}")
        self.conaugs.append(aug)
        return aug

    def add_oracle(self, oracle, *, name: Optional[str] = None) -> Constraint:
        """Register an opaque VectorNonlinearOracle constraint block
        (parity: constraint(c, ::VectorNonlinearOracle),
        /root/reference/src/oracle.jl:265-343). Appends oracle.ncon rows
        after all rows registered so far; returns a Constraint handle."""
        if oracle.nvar != self.nvar:
            raise ValueError(
                f"oracle.nvar={oracle.nvar} but model has nvar={self.nvar}; "
                "register oracles after all add_var calls"
            )
        off = self.ncon
        con = Constraint(off, oracle.ncon, (oracle.ncon,), None,
                         name or oracle.name)
        if name:
            self._register(name, con, "c")
        self.ncon += oracle.ncon
        self._y0.append(np.zeros(oracle.ncon))
        self._lcon.append(np.asarray(oracle.lcon, dtype=np.float64))
        self._ucon.append(np.asarray(oracle.ucon, dtype=np.float64))
        self.oracles.append((oracle, off))
        return con

    def add_scalar_oracle(self, oracle) -> None:
        """Register an opaque scalar objective oracle
        (parity: objective(c, ::ScalarNonlinearOracle), oracle.jl:189-263)."""
        self.scalar_oracles.append(oracle)

    def add_eval(self, evaluator) -> None:
        """Register an OracleEvaluator accumulating into existing rows
        (parity: add_eval, /root/reference/src/oracle.jl:1272-1393)."""
        rows = np.asarray(evaluator.con_rows)
        if len(rows) and (rows.min() < 0 or rows.max() >= self.ncon):
            raise IndexError("evaluator con_rows out of range")
        vix = np.asarray(evaluator.var_idx)
        if len(vix) and (vix.min() < 0 or vix.max() >= self.nvar):
            raise IndexError("evaluator var_idx out of range")
        self.evals.append(evaluator)

    def add_expr(self, template, data=None, *, shape=None, name: Optional[str] = None) -> Expression:
        table = DataTable.from_data(data)
        if shape is None:
            shape = (table.n,)
        else:
            shape = (shape,) if isinstance(shape, (int, np.integer)) else tuple(shape)
        sid = len(self.exprs) + 1  # 0 is reserved for each pattern's own table
        e = Expression(self, sid, template, table, shape, name or f"s{len(self.exprs)}")
        if name:
            self._register(name, e, "s")
        self.exprs.append(e)
        return e

    # -- assembled vectors ---------------------------------------------------
    def assemble_x0(self) -> np.ndarray:
        return np.concatenate(self._x0) if self._x0 else np.zeros(0)

    def assemble_lvar(self) -> np.ndarray:
        return np.concatenate(self._lvar) if self._lvar else np.zeros(0)

    def assemble_uvar(self) -> np.ndarray:
        return np.concatenate(self._uvar) if self._uvar else np.zeros(0)

    def assemble_theta0(self) -> np.ndarray:
        return np.concatenate(self._theta0) if self._theta0 else np.zeros(0)

    def assemble_y0(self) -> np.ndarray:
        return np.concatenate(self._y0) if self._y0 else np.zeros(0)

    def assemble_lcon(self) -> np.ndarray:
        return np.concatenate(self._lcon) if self._lcon else np.zeros(0)

    def assemble_ucon(self) -> np.ndarray:
        return np.concatenate(self._ucon) if self._ucon else np.zeros(0)

    def __repr__(self):
        return (
            f"ExaCore(nvar={self.nvar}, ncon={self.ncon}, npar={self.npar}, "
            f"objs={len(self.objs)}, cons={len(self.cons)}, "
            f"conaugs={len(self.conaugs)}, minimize={self.minimize})"
        )

    def describe(self) -> str:
        """Full model description with rendered expression templates
        (the `show` parity of /root/reference/src/prettyprint.jl)."""
        from ..core.prettyprint import node_str

        lines = [repr(self)]
        for v in self.vars:
            lines.append(f"  var {v.name}: shape {v.shape or '()'} @ {v.offset}")
        for pch in self.pars:
            lines.append(f"  par {pch.name}: shape {pch.shape or '()'} @ {pch.offset}")
        for o in self.objs:
            lines.append(f"  min {node_str(o.pattern.tree)}  [n={o.pattern.n}]")
        for con in self.cons:
            body = node_str(con.pattern.tree) if con.pattern is not None else "<empty>"
            lines.append(f"  s.t. {con.name}: {body}  [rows={con.n}]")
        for a in self.conaugs:
            lines.append(
                f"  aug  {a.con.name} += {node_str(a.pattern.tree)}  "
                f"[n={a.pattern.n}]"
            )
        for o, off in self.oracles:
            lines.append(f"  oracle {o.name}: {o.ncon} rows @ {off}")
        return "\n".join(lines)


# ---------------------------------------------------------------------------
# Functional-style aliases (parity with the reference's exported free
# functions add_var/add_par/add_obj/add_con/add_con!/add_expr,
# /root/reference/src/ExaModels.jl:65-119)
# ---------------------------------------------------------------------------


def add_var(core: ExaCore, *args, **kwargs) -> Variable:
    return core.add_var(*args, **kwargs)


def add_par(core: ExaCore, *args, **kwargs) -> Parameter:
    return core.add_par(*args, **kwargs)


def add_obj(core: ExaCore, *args, **kwargs) -> Objective:
    return core.add_obj(*args, **kwargs)


def add_con(core: ExaCore, *args, **kwargs) -> Constraint:
    return core.add_con(*args, **kwargs)


def add_con_aug(core: ExaCore, *args, **kwargs) -> ConstraintAug:
    return core.add_con_aug(*args, **kwargs)


def add_expr(core: ExaCore, *args, **kwargs) -> Expression:
    return core.add_expr(*args, **kwargs)


def add_oracle(core: ExaCore, *args, **kwargs) -> Constraint:
    return core.add_oracle(*args, **kwargs)


def add_scalar_oracle(core: ExaCore, *args, **kwargs) -> None:
    return core.add_scalar_oracle(*args, **kwargs)


def add_eval(core: ExaCore, *args, **kwargs) -> None:
    """Parity: add_eval, /root/reference/src/oracle.jl:1272-1393."""
    return core.add_eval(*args, **kwargs)
