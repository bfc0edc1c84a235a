"""Symbolic expression graph for SIMD-pattern templates.

A *template* is a Python callable taking one element proxy (and closing over
variable/parameter handles) and returning a scalar `Node`. The template is
called ONCE at model-build time with symbolic leaves; the resulting tree is
the pattern, evaluated later as one batched JAX program over the whole data
array (capability parity with the typed node trees of the reference,
/root/reference/src/graph.jl:1-487, re-designed: we trace to a host-side tree
whose *index expressions* are evaluated once into static gather arrays and
whose *value expression* compiles to a jax function that is vmapped).

Node kinds
----------
  Const(value)                      — literal (folded at construction)
  Data(source, path, idx)           — a field of the iterated data element;
                                      `idx` (a Node or None) supports inlined
                                      subexpressions gathering another table
  VarNode(block, index)             — decision variable x[flat index expr]
  ParamNode(block, index)           — parameter θ[flat index expr]
  Unary(op, a) / Binary(op, a, b)   — registered scalar operators
  NarySum(children)                 — shallow n-ary sum (reduction parity with
                                      SumNode, /root/reference/src/graph.jl:439)

Every node exposes `_skey()` — a structural key used to deduplicate repeated
variable occurrences into shared slots (the Compressor analogue,
/root/reference/src/simdfunction.jl:61-92).
"""

from __future__ import annotations

import math as _pymath
from dataclasses import dataclass
from typing import Any, Callable, Optional, Tuple

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Operator registry
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class UnivariateOp:
    name: str
    fn: Callable  # jnp implementation, scalar -> scalar
    d2: bool  # second derivative structurally nonzero?


@dataclass(frozen=True)
class BivariateOp:
    name: str
    fn: Callable
    d2_aa: bool
    d2_ab: bool
    d2_bb: bool


UNIVARIATE_OPS: dict[str, UnivariateOp] = {}
BIVARIATE_OPS: dict[str, BivariateOp] = {}


def register_univariate(name: str, fn: Callable, d2: bool = True) -> Callable:
    """Register a scalar unary operator usable inside templates.

    Parity: @register_univariate, /root/reference/src/register.jl:56-74 —
    but derivative code comes from JAX AD, so only the *structural* flag
    (does f'' vanish identically) is declared here.

    Returns a function dispatching on Node vs. plain numbers.
    """
    UNIVARIATE_OPS[name] = UnivariateOp(name, fn, d2)

    def dispatch(x):
        if isinstance(x, Node):
            return make_unary(name, x)
        return fn(x)

    dispatch.__name__ = name
    return dispatch


def register_bivariate(
    name: str,
    fn: Callable,
    d2_aa: bool = True,
    d2_ab: bool = True,
    d2_bb: bool = True,
) -> Callable:
    """Register a scalar binary operator (parity: @register_bivariate,
    /root/reference/src/register.jl:123-257)."""
    BIVARIATE_OPS[name] = BivariateOp(name, fn, d2_aa, d2_ab, d2_bb)

    def dispatch(a, b):
        if isinstance(a, Node) or isinstance(b, Node):
            return make_binary(name, a, b)
        return fn(a, b)

    dispatch.__name__ = name
    return dispatch


# ---------------------------------------------------------------------------
# Node types
# ---------------------------------------------------------------------------


class Node:
    """Base class for all expression-tree nodes. Immutable."""

    __slots__ = ("_cached_skey",)

    # -- structural key -----------------------------------------------------
    def _skey(self) -> tuple:
        k = getattr(self, "_cached_skey", None)
        if k is None:
            k = self._make_skey()
            object.__setattr__(self, "_cached_skey", k)
        return k

    def _make_skey(self) -> tuple:  # pragma: no cover - abstract
        raise NotImplementedError

    # -- operator overloads ---------------------------------------------------
    def __add__(self, o):
        return make_binary("add", self, o)

    def __radd__(self, o):
        return make_binary("add", o, self)

    def __sub__(self, o):
        return make_binary("sub", self, o)

    def __rsub__(self, o):
        return make_binary("sub", o, self)

    def __mul__(self, o):
        return make_binary("mul", self, o)

    def __rmul__(self, o):
        return make_binary("mul", o, self)

    def __truediv__(self, o):
        return make_binary("div", self, o)

    def __rtruediv__(self, o):
        return make_binary("div", o, self)

    def __pow__(self, o):
        return make_binary("pow", self, o)

    def __rpow__(self, o):
        return make_binary("pow", o, self)

    def __neg__(self):
        return make_unary("neg", self)

    def __pos__(self):
        return self

    def __abs__(self):
        return make_unary("abs", self)

    def __floordiv__(self, o):
        return make_binary("floordiv", self, o)

    def __mod__(self, o):
        return make_binary("mod", self, o)

    # Nodes are trace-time objects; truthiness is a user error.
    def __bool__(self):
        raise TypeError(
            "expression Node has no truth value: templates are traced once "
            "symbolically, data-dependent Python branching is not allowed "
            "(use emath.max_/min_ or where-style algebra)"
        )

    def __repr__(self):
        from .prettyprint import node_str

        return node_str(self)


class Const(Node):
    __slots__ = ("value",)

    def __init__(self, value):
        object.__setattr__(self, "value", value)

    def _make_skey(self):
        return ("const", type(self.value).__name__, self.value)


class Data(Node):
    """Access to a field of the iterated data element.

    `source` — integer id of the data table (0 = the pattern's own table;
    other ids refer to inlined-subexpression tables).
    `path`   — tuple of attribute names / integer positions into the element.
    `idx`    — None when aligned with the iteration axis, else an int-valued
               Node gathering a row of the source table (subexpression
               inlining parity: DataIndexed, /root/reference/src/graph.jl:166).

    Attribute and item access extend the path, so the element proxy handed to
    a template is simply `Data(source, (), None)`.
    """

    __slots__ = ("_source", "_path", "_idx")

    def __init__(self, source: int, path: tuple = (), idx: Optional[Node] = None):
        object.__setattr__(self, "_source", source)
        object.__setattr__(self, "_path", path)
        object.__setattr__(self, "_idx", idx)

    def _make_skey(self):
        ik = self._idx._skey() if self._idx is not None else None
        return ("data", self._source, self._path, ik)

    def __getattr__(self, name: str):
        if name.startswith("_"):
            raise AttributeError(name)
        return Data(self._source, self._path + (name,), self._idx)

    def __getitem__(self, item):
        if isinstance(item, tuple):
            return Data(self._source, self._path + item, self._idx)
        return Data(self._source, self._path + (item,), self._idx)

    def __iter__(self):
        raise TypeError(
            "data element proxies cannot be unpacked with a data-dependent "
            "length; index fields explicitly (d[0], d[1], ... or d.name)"
        )


class VarNode(Node):
    """x[<flat index expr>] — `block` is the owning Variable handle's id."""

    __slots__ = ("block", "index")

    def __init__(self, block: int, index: Node):
        object.__setattr__(self, "block", block)
        object.__setattr__(self, "index", index)

    def _make_skey(self):
        return ("var", self.block, self.index._skey())


class ParamNode(Node):
    __slots__ = ("block", "index")

    def __init__(self, block: int, index: Node):
        object.__setattr__(self, "block", block)
        object.__setattr__(self, "index", index)

    def _make_skey(self):
        return ("par", self.block, self.index._skey())


class Unary(Node):
    __slots__ = ("op", "a")

    def __init__(self, op: str, a: Node):
        object.__setattr__(self, "op", op)
        object.__setattr__(self, "a", a)

    def _make_skey(self):
        return ("u", self.op, self.a._skey())


class Binary(Node):
    __slots__ = ("op", "a", "b")

    def __init__(self, op: str, a: Node, b: Node):
        object.__setattr__(self, "op", op)
        object.__setattr__(self, "a", a)
        object.__setattr__(self, "b", b)

    def _make_skey(self):
        return ("b", self.op, self.a._skey(), self.b._skey())


class NarySum(Node):
    """Shallow n-ary sum — keeps inner reductions from building O(n)-deep
    binary chains (parity: SumNode/exa_sum, /root/reference/src/graph.jl:439,
    /root/reference/src/specialization.jl:253-298)."""

    __slots__ = ("children",)

    def __init__(self, children: Tuple[Node, ...]):
        object.__setattr__(self, "children", children)

    def _make_skey(self):
        return ("nsum",) + tuple(c._skey() for c in self.children)


# ---------------------------------------------------------------------------
# Construction with constant folding + algebraic simplification
# (parity: /root/reference/src/specialization.jl:175-339)
# ---------------------------------------------------------------------------


def as_node(v) -> Node:
    if isinstance(v, Node):
        return v
    if isinstance(v, (bool, np.bool_)):
        return Const(int(v))
    if isinstance(v, (int, np.integer)):
        return Const(int(v))
    if isinstance(v, (float, np.floating)):
        return Const(float(v))
    raise TypeError(
        f"cannot use object of type {type(v).__name__} inside an expression "
        "template (expected a Node or a Python/NumPy scalar)"
    )


def _const_value(n: Node):
    return n.value if isinstance(n, Const) else None


def make_unary(op: str, a) -> Node:
    a = as_node(a)
    spec = UNIVARIATE_OPS.get(op)
    if spec is None:
        raise ValueError(f"unknown univariate operator {op!r}")
    av = _const_value(a)
    if av is not None:
        return Const(_fold_unary(spec, av))
    if op == "neg" and isinstance(a, Unary) and a.op == "neg":
        return a.a
    return Unary(op, a)


def _fold_unary(spec: UnivariateOp, av):
    out = spec.fn(av)
    if isinstance(out, jnp.ndarray):
        out = np.asarray(out)
    if isinstance(out, (np.generic, np.ndarray)):
        out = out.item()
    if isinstance(av, int) and spec.name in ("neg", "abs") :
        return int(out)
    return out


def make_binary(op: str, a, b) -> Node:
    a = as_node(a)
    b = as_node(b)
    spec = BIVARIATE_OPS.get(op)
    if spec is None:
        raise ValueError(f"unknown bivariate operator {op!r}")
    av, bv = _const_value(a), _const_value(b)
    if av is not None and bv is not None:
        return Const(_fold_binary(op, spec, av, bv))

    # algebraic simplifications keep Hessian structure tight
    if op == "add":
        if av == 0:
            return b
        if bv == 0:
            return a
    elif op == "sub":
        if bv == 0:
            return a
        if av == 0:
            return make_unary("neg", b)
    elif op == "mul":
        if av == 0 or bv == 0:
            return Const(0)
        if av == 1:
            return b
        if bv == 1:
            return a
        if av == -1:
            return make_unary("neg", b)
        if bv == -1:
            return make_unary("neg", a)
    elif op == "div":
        if bv == 1:
            return a
        if av == 0:
            return Const(0)
    elif op == "pow":
        if bv == 0:
            return Const(1)
        if bv == 1:
            return a
    return Binary(op, a, b)


def _fold_binary(op, spec, av, bv):
    if isinstance(av, int) and isinstance(bv, int):
        if op == "add":
            return av + bv
        if op == "sub":
            return av - bv
        if op == "mul":
            return av * bv
        if op == "floordiv":
            return av // bv
        if op == "mod":
            return av % bv
    if op == "pow" and isinstance(av, int) and isinstance(bv, int) and bv >= 0:
        return av**bv
    out = spec.fn(av, bv)
    if isinstance(out, jnp.ndarray):
        out = np.asarray(out)
    if isinstance(out, (np.generic, np.ndarray)):
        out = out.item()
    return out


def nary_sum(terms) -> Node:
    """Sum of an iterable of nodes/scalars as one shallow node."""
    const_acc = 0
    children = []
    for t in terms:
        t = as_node(t)
        v = _const_value(t)
        if v is not None:
            const_acc = const_acc + v
        elif isinstance(t, NarySum):
            children.extend(t.children)
        else:
            children.append(t)
    if const_acc != 0:
        children.append(Const(const_acc))
    if not children:
        return Const(0)
    if len(children) == 1:
        return children[0]
    return NarySum(tuple(children))


def nary_prod(terms) -> Node:
    """Product reduction (folded as a mul chain; parity: ProdNode,
    /root/reference/src/graph.jl:450)."""
    acc = None
    for t in terms:
        acc = as_node(t) if acc is None else make_binary("mul", acc, t)
    return Const(1) if acc is None else acc


# ---------------------------------------------------------------------------
# Built-in operator tables
# (parity: /root/reference/src/functionlist.jl:6-85 — the (f, f', f'') lambda
# tables are unnecessary here, JAX differentiates; only names + structure)
# ---------------------------------------------------------------------------


def _register_builtin_ops():
    import jax

    u = register_univariate
    # piecewise-linear / zero second derivative
    u("neg", lambda x: -x, d2=False)
    u("abs", jnp.abs, d2=False)
    u("floor", jnp.floor, d2=False)
    u("ceil", jnp.ceil, d2=False)
    u("sign", jnp.sign, d2=False)
    u("round", jnp.round, d2=False)
    # smooth nonlinear
    u("abs2", jnp.square)
    u("square", jnp.square)
    u("inv", lambda x: 1.0 / x)
    u("sqrt", jnp.sqrt)
    u("cbrt", jnp.cbrt)
    u("exp", jnp.exp)
    u("exp2", jnp.exp2)
    u("exp10", lambda x: jnp.exp(x * _pymath.log(10.0)))
    u("expm1", jnp.expm1)
    u("log", jnp.log)
    u("log2", jnp.log2)
    u("log10", jnp.log10)
    u("log1p", jnp.log1p)
    u("sin", jnp.sin)
    u("cos", jnp.cos)
    u("tan", jnp.tan)
    u("asin", jnp.arcsin)
    u("acos", jnp.arccos)
    u("atan", jnp.arctan)
    u("sinh", jnp.sinh)
    u("cosh", jnp.cosh)
    u("tanh", jnp.tanh)
    u("asinh", jnp.arcsinh)
    u("acosh", jnp.arccosh)
    u("atanh", jnp.arctanh)
    u("csc", lambda x: 1.0 / jnp.sin(x))
    u("sec", lambda x: 1.0 / jnp.cos(x))
    u("cot", lambda x: jnp.cos(x) / jnp.sin(x))
    u("acsc", lambda x: jnp.arcsin(1.0 / x))
    u("asec", lambda x: jnp.arccos(1.0 / x))
    u("acot", lambda x: jnp.arctan(1.0 / x))
    u("csch", lambda x: 1.0 / jnp.sinh(x))
    u("sech", lambda x: 1.0 / jnp.cosh(x))
    u("coth", lambda x: jnp.cosh(x) / jnp.sinh(x))
    u("acsch", lambda x: jnp.arcsinh(1.0 / x))
    u("asech", lambda x: jnp.arccosh(1.0 / x))
    u("acoth", lambda x: jnp.arctanh(1.0 / x))
    u("sind", lambda x: jnp.sin(jnp.deg2rad(x)))
    u("cosd", lambda x: jnp.cos(jnp.deg2rad(x)))
    u("tand", lambda x: jnp.tan(jnp.deg2rad(x)))
    u("logit", lambda x: jnp.log(x / (1.0 - x)))
    u("sigmoid", jax.nn.sigmoid)
    # special functions (parity: ext/ExaModelsSpecialFunctions.jl)
    from jax.scipy import special as jsp

    u("erf", jsp.erf)
    u("erfc", jsp.erfc)
    u("erfinv", jsp.erfinv)
    u("gammaln", jsp.gammaln)
    u("loggamma", jsp.gammaln)
    u("digamma", jsp.digamma)
    u("gamma", lambda x: jnp.exp(jsp.gammaln(x)))
    u("besseli0", jsp.i0)
    u("besseli1", jsp.i1)
    u("i0e", jsp.i0e)
    u("i1e", jsp.i1e)

    b = register_bivariate
    b("add", lambda a, x: a + x, False, False, False)
    b("sub", lambda a, x: a - x, False, False, False)
    b("mul", lambda a, x: a * x, False, True, False)
    b("div", lambda a, x: a / x, False, True, True)
    b("pow", _pow_impl, True, True, True)
    b("atan2", jnp.arctan2, True, True, True)
    b("hypot", jnp.hypot, True, True, True)
    # max/min: piecewise selection — second derivatives vanish a.e.
    b("max", jnp.maximum, False, False, False)
    b("min", jnp.minimum, False, False, False)
    b("mod", lambda a, x: a % x, False, False, False)
    b("floordiv", lambda a, x: a // x, False, False, False)
    # AMPL/C-style truncated variants (sign of the DIVIDEND, unlike the
    # floored `%`/`//` above): .nl opcodes o4 (OPREM) and o55 (OPintDIV)
    b("rem", lambda a, x: a - jnp.trunc(a / x) * x, False, False, False)
    b("truncdiv", lambda a, x: jnp.trunc(a / x), False, False, False)
    b("logaddexp", jnp.logaddexp, True, True, True)
    b("beta", lambda a, x: jnp.exp(jsp.gammaln(a) + jsp.gammaln(x) - jsp.gammaln(a + x)), True, True, True)
    b("logbeta", lambda a, x: jsp.gammaln(a) + jsp.gammaln(x) - jsp.gammaln(a + x), True, True, True)


def _pow_impl(a, x):
    # `a**x`: with an int literal exponent, Python dispatch reaches
    # lax.integer_pow — exact and well-defined for negative bases. The real
    # integer_pow specialization (constant folding, x^2 -> abs2) happens at
    # trace time in make_eval_fn (parity: _pow_val / literal_pow handling,
    # /root/reference/src/specialization.jl:193-202).
    return a**x


_register_builtin_ops()
