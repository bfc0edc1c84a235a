"""Pattern compiler: template tree -> batched JAX evaluator + static sparsity.

The analogue of SIMDFunction/Compressor (/root/reference/src/simdfunction.jl)
and of the sparsity-detection modes of grpass/hrpass0
(/root/reference/src/gradient.jl:87-158, /root/reference/src/hessian.jl:382-641),
re-designed for XLA:

  * the template is traced once (host-side tree, graph.py);
  * unique variable occurrences are deduplicated by structural key into
    *slots* 0..p-1 (p = o1step: gradient/Jacobian entries per element);
  * Hessian slot-pairs are enumerated by a structural second-order walk with
    linear-operator pruning (p_aa/p_ab/p_bb flags), lower-triangle
    canonicalized — o2step entries per element;
  * index expressions (slot -> global flat variable index) are *data-only*,
    so they are evaluated once at build time with NumPy into static gather /
    scatter arrays — runtime kernels never compute indices;
  * the value expression compiles to `f(v, d, th) -> scalar` over the
    *gathered* slot values; jax.vmap/grad/jacfwd provide the batched
    derivative kernels (model.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import jax.numpy as jnp
import numpy as np

from .graph import (
    BIVARIATE_OPS,
    UNIVARIATE_OPS,
    Binary,
    Const,
    Data,
    NarySum,
    Node,
    ParamNode,
    Unary,
    VarNode,
)

# ---------------------------------------------------------------------------
# Data tables: iterable-of-elements -> struct of numpy columns
# ---------------------------------------------------------------------------


class DataTable:
    """Struct-of-arrays view of an iterated data set.

    Elements may be scalars, tuples, dicts, namedtuples, or nested
    combinations; each leaf becomes one column keyed by its access path.
    """

    def __init__(self, columns: dict, n: int):
        self.columns = columns  # path tuple -> np.ndarray of shape (n, ...)
        self.n = n

    @staticmethod
    def from_data(data) -> "DataTable":
        if data is None:
            return DataTable({}, 1)
        if isinstance(data, DataTable):
            return data
        if isinstance(data, dict):
            cols = {}
            n = None
            for k, v in data.items():
                arr = np.asarray(v)
                if n is None:
                    n = arr.shape[0]
                elif arr.shape[0] != n:
                    raise ValueError(
                        f"data dict column {k!r} has length {arr.shape[0]}, "
                        f"expected {n}"
                    )
                cols[(k,)] = arr
            return DataTable(cols, 0 if n is None else n)
        if isinstance(data, range):
            return DataTable({(): np.asarray(data, dtype=np.int64)}, len(data))
        if isinstance(data, np.ndarray):
            if data.ndim != 1:
                raise ValueError("ndarray data must be 1-D (one element per row)")
            return DataTable({(): data}, data.shape[0])
        elements = list(data)
        n = len(elements)
        if n == 0:
            return DataTable({}, 0)
        cols = {}
        _flatten_element(elements[0], (), cols)
        out = {}
        for path in cols:
            out[path] = np.asarray([_get_path(el, path) for el in elements])
        return DataTable(out, n)

    def column(self, path: tuple) -> np.ndarray:
        if path in self.columns:
            return self.columns[path]
        # dict-of-arrays data accessed positionally, or scalar data accessed
        # with empty path
        raise KeyError(
            f"data has no field {'.'.join(map(str, path)) or '<element>'}; "
            f"available: {sorted(self.columns.keys())}"
        )


def _flatten_element(el, path, cols):
    if isinstance(el, (bool, int, float, np.generic)):
        cols[path] = None
    elif isinstance(el, dict):
        for k, v in el.items():
            _flatten_element(v, path + (k,), cols)
    elif hasattr(el, "_fields"):  # namedtuple
        for k in el._fields:
            _flatten_element(getattr(el, k), path + (k,), cols)
    elif isinstance(el, (tuple, list, np.ndarray)):
        for i, v in enumerate(el):
            _flatten_element(v, path + (i,), cols)
    else:
        raise TypeError(
            f"unsupported data element leaf of type {type(el).__name__} at "
            f"path {path}"
        )


def _get_path(el, path):
    for p in path:
        el = getattr(el, p) if isinstance(p, str) and hasattr(el, p) else el[p]
    return el


# ---------------------------------------------------------------------------
# Build-time index-expression evaluation (NumPy, vectorized over the table)
# ---------------------------------------------------------------------------

_INT_BINARY = {
    "add": np.add,
    "sub": np.subtract,
    "mul": np.multiply,
    "floordiv": np.floor_divide,
    "mod": np.mod,
    "max": np.maximum,
    "min": np.minimum,
}


def eval_index(node: Node, tables: dict, n: int, memo: Optional[dict] = None) -> np.ndarray:
    """Evaluate a data-only (x-independent) expression over the whole table.

    Used for variable/parameter indices, conaug target rows, and subexpression
    gather indices — the analogue of running offset0 / index trees on data
    (/root/reference/src/nlp.jl:1524-1539), hoisted to build time.
    """
    if memo is None:
        memo = {}
    key = id(node)
    if key in memo:
        return memo[key]
    if isinstance(node, Const):
        out = np.full(n, node.value)
    elif isinstance(node, Data):
        tab = tables[node._source]
        col = tab.column(node._path)
        if node._idx is not None:
            gidx = eval_index(node._idx, tables, n, memo)
            out = col[np.asarray(gidx, dtype=np.int64)]
        else:
            if tab.n != n:
                raise ValueError(
                    "misaligned data table access in index expression"
                )
            out = col
    elif isinstance(node, Unary) and node.op == "neg":
        out = -eval_index(node.a, tables, n, memo)
    elif isinstance(node, Binary) and node.op in _INT_BINARY:
        out = _INT_BINARY[node.op](
            eval_index(node.a, tables, n, memo),
            eval_index(node.b, tables, n, memo),
        )
    else:
        raise TypeError(
            "variable/parameter/row index expressions must be built from "
            f"data fields, constants and integer arithmetic; found {node!r}"
        )
    out = np.broadcast_to(out, (n,)) if np.ndim(out) == 0 else out
    memo[key] = out
    return out


# ---------------------------------------------------------------------------
# Structural walks: leaf collection + Hessian pair enumeration
# ---------------------------------------------------------------------------


def _collect_leaves(root: Node):
    """DFS preorder collection of Var/Param/Data leaves with structural dedup.

    Returns (var_leaves, var_slot_of, par_leaves, par_slot_of,
    data_leaves, data_slot_of) where *_slot_of maps structural key -> slot.
    (Compressor analogue, /root/reference/src/simdfunction.jl:61-92.)
    """
    var_leaves, var_slots = [], {}
    par_leaves, par_slots = [], {}
    data_leaves, data_slots = [], {}
    seen = set()
    stack = [root]
    # iterative DFS preorder with explicit stack (templates can share nodes)
    order = []
    while stack:
        nd = stack.pop()
        if id(nd) in seen:
            continue
        seen.add(id(nd))
        order.append(nd)
        if isinstance(nd, Unary):
            stack.append(nd.a)
        elif isinstance(nd, Binary):
            stack.extend((nd.b, nd.a))
        elif isinstance(nd, NarySum):
            stack.extend(reversed(nd.children))
    # re-walk in deterministic preorder (stack pops give preorder already,
    # but shared nodes appear at first visit which is what we want)
    for nd in order:
        if isinstance(nd, VarNode):
            k = nd._skey()
            if k not in var_slots:
                var_slots[k] = len(var_leaves)
                var_leaves.append(nd)
        elif isinstance(nd, ParamNode):
            k = nd._skey()
            if k not in par_slots:
                par_slots[k] = len(par_leaves)
                par_leaves.append(nd)
        elif isinstance(nd, Data):
            k = nd._skey()
            if k not in data_slots:
                data_slots[k] = len(data_leaves)
                data_leaves.append(nd)
    return var_leaves, var_slots, par_leaves, par_slots, data_leaves, data_slots


def _hessian_pairs(root: Node, var_slots: dict) -> list:
    """Enumerate structurally-nonzero Hessian slot pairs, lower-triangle
    canonicalized, with linear-operator pruning (hrpass0 semantics,
    /root/reference/src/hessian.jl:382-641).
    """
    pairs: dict = {}  # ordered set of (pmax, pmin)
    varset_memo: dict = {}

    def add_pairs(sa, sb):
        for i in sa:
            for j in sb:
                key = (i, j) if i >= j else (j, i)
                pairs.setdefault(key, None)

    def walk(nd: Node) -> frozenset:
        k = id(nd)
        got = varset_memo.get(k)
        if got is not None:
            return got
        if isinstance(nd, VarNode):
            s = frozenset((var_slots[nd._skey()],))
        elif isinstance(nd, Unary):
            s = walk(nd.a)
            if UNIVARIATE_OPS[nd.op].d2:
                add_pairs(s, s)
        elif isinstance(nd, Binary):
            sa, sb = walk(nd.a), walk(nd.b)
            spec = BIVARIATE_OPS[nd.op]
            if spec.d2_aa:
                add_pairs(sa, sa)
            if spec.d2_bb:
                add_pairs(sb, sb)
            if spec.d2_ab:
                add_pairs(sa, sb)
            s = sa | sb
        elif isinstance(nd, NarySum):
            s = frozenset()
            for c in nd.children:
                s = s | walk(c)
        else:  # Const, Data, ParamNode
            s = frozenset()
        varset_memo[k] = s
        return s

    walk(root)
    out = list(pairs.keys())
    # deduplicate (already) and keep deterministic encounter order, but the
    # lower-triangle convention means (i, i) diagonal entries are stored once
    return out


# ---------------------------------------------------------------------------
# Fused one-pass Hessian: edge-pushing second-order reverse over the tree
# ---------------------------------------------------------------------------


class _StructVal:
    """Sentinel for the structural dry-run: 'some nonzero value'. Any
    arithmetic yields the sentinel, so the emission recursion can run
    without JAX and its control flow stays identical to the traced run."""

    __slots__ = ()

    def _op(self, *a):
        return self

    __add__ = __radd__ = __sub__ = __rsub__ = _op
    __mul__ = __rmul__ = __truediv__ = __rtruediv__ = _op
    __pow__ = __rpow__ = __neg__ = _op

    def __repr__(self):
        return "<S>"


_S = _StructVal()


def _nadd(a, b):
    """None-aware add (None = structural zero)."""
    if a is None:
        return b
    if b is None:
        return a
    return a + b


def _nmul2(a, b):
    if a is None or b is None:
        return None
    return a * b


def _nmul3(a, b, c):
    if a is None or b is None or c is None:
        return None
    return (a * b) * c


# Hand-written first/second derivatives for the hottest scalar ops: keeps the
# emitted jaxpr lean (the generic path re-traces jax.grad of the op fn, which
# XLA CSEs away but bloats trace time). val = already-computed f(x).
_U1 = {
    "exp": lambda x, v: v,
    "log": lambda x, v: 1.0 / x,
    "sin": lambda x, v: jnp.cos(x),
    "cos": lambda x, v: -jnp.sin(x),
    "sqrt": lambda x, v: 0.5 / v,
    "abs2": lambda x, v: 2.0 * x,
    "square": lambda x, v: 2.0 * x,
    "inv": lambda x, v: -v * v,
    "tanh": lambda x, v: 1.0 - v * v,
    "neg": lambda x, v: -1.0,
}
_U2 = {
    "exp": lambda x, v: v,
    "log": lambda x, v: -1.0 / (x * x),
    "sin": lambda x, v: -v,
    "cos": lambda x, v: -v,
    "sqrt": lambda x, v: -0.25 / (v * x),
    "abs2": lambda x, v: 2.0,
    "square": lambda x, v: 2.0,
    "inv": lambda x, v: 2.0 * v * v * v,
    "tanh": lambda x, v: -2.0 * v * (1.0 - v * v),
}


def _unary_partials(op: str, xa, val, struct: bool):
    """(f'(x), f''(x)); f'' is None iff structurally zero (the d2 flag —
    keeps emission in sync with _hessian_pairs)."""
    import jax

    spec = UNIVARIATE_OPS[op]
    if struct:
        return _S, (_S if spec.d2 else None)
    d1 = _U1[op](xa, val) if op in _U1 else jax.grad(spec.fn)(xa)
    if not spec.d2:
        return d1, None
    d2 = _U2[op](xa, val) if op in _U2 else jax.grad(jax.grad(spec.fn))(xa)
    return d1, d2


def _binary_partials(op: str, av, bv, struct: bool):
    """(ga, gb, gaa, gab, gbb); second partials None per the structural
    d2_aa/d2_ab/d2_bb flags (matching _hessian_pairs)."""
    import jax

    spec = BIVARIATE_OPS[op]
    if struct:
        return (
            _S,
            _S,
            _S if spec.d2_aa else None,
            _S if spec.d2_ab else None,
            _S if spec.d2_bb else None,
        )
    if op == "add":
        return 1.0, 1.0, None, None, None
    if op == "sub":
        return 1.0, -1.0, None, None, None
    if op == "mul":
        return bv, av, None, 1.0, None
    if op == "div":
        ib = 1.0 / bv
        gb = -av * ib * ib
        return ib, gb, None, -ib * ib, -2.0 * gb * ib
    ga = jax.grad(spec.fn, argnums=0)(av, bv)
    gb = jax.grad(spec.fn, argnums=1)(av, bv)
    gaa = (
        jax.grad(jax.grad(spec.fn, argnums=0), argnums=0)(av, bv)
        if spec.d2_aa
        else None
    )
    gab = (
        jax.grad(jax.grad(spec.fn, argnums=0), argnums=1)(av, bv)
        if spec.d2_ab
        else None
    )
    gbb = (
        jax.grad(jax.grad(spec.fn, argnums=1), argnums=1)(av, bv)
        if spec.d2_bb
        else None
    )
    return ga, gb, gaa, gab, gbb


def _int_pow_exponent(node: Node):
    """k if node is pow(a, Const(int k)) — the integer_pow special case of
    make_eval_fn; None otherwise."""
    if (
        isinstance(node, Binary)
        and node.op == "pow"
        and isinstance(node.b, Const)
        and isinstance(node.b.value, int)
    ):
        return node.b.value
    return None


def make_hess_entry_fn(
    root: Node,
    var_slots: dict,
    par_slots: dict,
    data_slots: dict,
    hpairs,
):
    """Fused single-pass Hessian: h(v, d, th) -> (o2step,) COO entry values
    aligned with `hpairs` (canonical (max, min) slot pairs).

    Edge-pushing second-order reverse AD specialized to expression trees
    (parity: hrpass/hrpass0/hdrpass, /root/reference/src/hessian.jl:16-717,
    which evaluates all entries in ONE traversal): a forward value sweep,
    then a downward pass carrying (adj, adj2) — adj2 is exact as a scalar
    because on a tree every slot pair has a unique meeting node, where the
    cross term adj2*g1*g2 + adj*g12 is scattered over the product of the two
    subtree gradients. Structural-zero tracking (None) reproduces the
    linear-operator pruning of hrpass0, so linear patterns emit nothing.

    Replaces the jacfwd(grad) dense p*p evaluation: cost is O(tree) instead
    of O(p * tree) — the dominant win on the Hessian hot path
    (/root/reference/README.md:29: "Hessian computations are the typical
    bottlenecks").
    """
    hlist = [tuple(int(v) for v in pq) for pq in hpairs]
    hpos = {pq: k for k, pq in enumerate(hlist)}

    def run(v, d, th, struct: bool):
        vals: dict = {}
        dgm: dict = {}
        entries: dict = {}

        def value(n: Node):
            k = id(n)
            if k in vals:
                return vals[k]
            if isinstance(n, Const):
                out = _S if struct else n.value
            elif isinstance(n, VarNode):
                out = _S if struct else v[var_slots[n._skey()]]
            elif isinstance(n, ParamNode):
                out = _S if struct else th[par_slots[n._skey()]]
            elif isinstance(n, Data):
                out = _S if struct else d[data_slots[n._skey()]]
            elif isinstance(n, Unary):
                out = (
                    _S
                    if struct
                    else UNIVARIATE_OPS[n.op].fn(value(n.a))
                )
            elif isinstance(n, Binary):
                kexp = _int_pow_exponent(n)
                if kexp is not None:
                    out = _S if struct else value(n.a) ** kexp
                else:
                    out = (
                        _S
                        if struct
                        else BIVARIATE_OPS[n.op].fn(value(n.a), value(n.b))
                    )
            elif isinstance(n, NarySum):
                if struct:
                    out = _S
                else:
                    acc = None
                    for c in n.children:
                        t = value(c)
                        acc = t if acc is None else acc + t
                    out = acc
            else:
                raise TypeError(f"cannot evaluate node {n!r}")
            vals[k] = out
            return out

        def dgrad(n: Node) -> dict:
            """slot -> d(subtree)/d(slot), aggregated over occurrences."""
            k = id(n)
            if k in dgm:
                return dgm[k]
            if isinstance(n, VarNode):
                out = {var_slots[n._skey()]: _S if struct else 1.0}
            elif isinstance(n, (Const, ParamNode, Data)):
                out = {}
            elif isinstance(n, Unary):
                da = dgrad(n.a)
                if da:
                    d1, _ = _unary_partials(n.op, value(n.a), value(n), struct)
                    out = {s: d1 * w for s, w in da.items()}
                else:
                    out = {}
            elif isinstance(n, Binary):
                kexp = _int_pow_exponent(n)
                if kexp is not None:
                    da = dgrad(n.a)
                    if da and kexp != 0:
                        d1 = (
                            _S
                            if struct
                            else float(kexp) * value(n.a) ** (kexp - 1)
                        )
                        out = {s: d1 * w for s, w in da.items()}
                    else:
                        out = {}
                else:
                    da, db = dgrad(n.a), dgrad(n.b)
                    out = {}
                    if da or db:
                        ga, gb, _, _, _ = _binary_partials(
                            n.op, value(n.a), value(n.b), struct
                        )
                        for s, w in da.items():
                            out[s] = ga * w
                        for s, w in db.items():
                            out[s] = _nadd(out.get(s), gb * w)
            elif isinstance(n, NarySum):
                out = {}
                for c in n.children:
                    for s, w in dgrad(c).items():
                        out[s] = _nadd(out.get(s), w)
            else:
                raise TypeError(f"cannot differentiate node {n!r}")
            dgm[k] = out
            return out

        def emit(i: int, j: int, val):
            key = (i, j) if i >= j else (j, i)
            entries[key] = _nadd(entries.get(key), val)

        def cross(da: dict, db: dict, c):
            for i, wi in da.items():
                for j, wj in db.items():
                    contrib = _nmul3(c, wi, wj)
                    if contrib is None:
                        continue
                    if i == j:
                        # both orders (u,v) and (v,u) land on the same
                        # canonical entry (diagonal doubling, parity:
                        # /root/reference/src/hessian.jl:262-267)
                        contrib = contrib + contrib
                    emit(i, j, contrib)

        def hrpass(n: Node, a1, a2):
            if isinstance(n, VarNode):
                if a2 is not None:
                    s = var_slots[n._skey()]
                    emit(s, s, a2)
                return
            if isinstance(n, (Const, ParamNode, Data)):
                return
            if isinstance(n, Unary):
                if not dgrad(n.a):
                    return
                d1, d2v = _unary_partials(n.op, value(n.a), value(n), struct)
                hrpass(
                    n.a,
                    _nmul2(a1, d1),
                    _nadd(_nmul3(a2, d1, d1), _nmul2(a1, d2v)),
                )
                return
            if isinstance(n, Binary):
                kexp = _int_pow_exponent(n)
                if kexp is not None:
                    if not dgrad(n.a) or kexp == 0:
                        return
                    if struct:
                        d1 = _S
                        d2v = _S if kexp != 1 else None
                    else:
                        d1 = float(kexp) * value(n.a) ** (kexp - 1)
                        d2v = (
                            float(kexp * (kexp - 1)) * value(n.a) ** (kexp - 2)
                            if kexp != 1
                            else None
                        )
                    hrpass(
                        n.a,
                        _nmul2(a1, d1),
                        _nadd(_nmul3(a2, d1, d1), _nmul2(a1, d2v)),
                    )
                    return
                da, db = dgrad(n.a), dgrad(n.b)
                if not da and not db:
                    return
                ga, gb, gaa, gab, gbb = _binary_partials(
                    n.op, value(n.a), value(n.b), struct
                )
                if da:
                    hrpass(
                        n.a,
                        _nmul2(a1, ga),
                        _nadd(_nmul3(a2, ga, ga), _nmul2(a1, gaa)),
                    )
                if db:
                    hrpass(
                        n.b,
                        _nmul2(a1, gb),
                        _nadd(_nmul3(a2, gb, gb), _nmul2(a1, gbb)),
                    )
                if da and db:
                    cross(da, db, _nadd(_nmul3(a2, ga, gb), _nmul2(a1, gab)))
                return
            if isinstance(n, NarySum):
                kids = [c for c in n.children if dgrad(c)]
                for c in kids:
                    hrpass(c, a1, a2)
                if a2 is not None:
                    for ii in range(len(kids)):
                        for jj in range(ii + 1, len(kids)):
                            cross(dgrad(kids[ii]), dgrad(kids[jj]), a2)
                return
            raise TypeError(f"cannot hrpass node {n!r}")

        hrpass(root, _S if struct else 1.0, None)
        return entries

    # structural dry-run: the emission set must agree with _hessian_pairs
    # (same recursion, sentinel values) — a mismatch means the two walks
    # diverged and entries would be silently dropped.
    emitted = run(None, None, None, struct=True)
    for key in emitted:
        if key not in hpos:
            raise RuntimeError(
                f"fused-Hessian emission {key} missing from the structural "
                f"pair enumeration {hlist} — walks out of sync"
            )

    n_out = len(hlist)

    def h(v, d, th):
        if not n_out:
            return jnp.zeros((0,), dtype=v.dtype)
        entries = run(v, d, th, struct=False)
        buf = [None] * n_out
        for key, val in entries.items():
            buf[hpos[key]] = val
        zero = jnp.zeros((), dtype=v.dtype)
        return jnp.stack(
            [zero if b is None else jnp.asarray(b, dtype=v.dtype) for b in buf]
        )

    return h


# ---------------------------------------------------------------------------
# Value compilation: tree -> f(v, d, th) over gathered slot values
# ---------------------------------------------------------------------------


def make_eval_fn(root: Node, var_slots: dict, par_slots: dict, data_slots: dict):
    """Compile the tree to a scalar function of (v, d, th):

      v  — (p,) gathered variable values for one element
      d  — tuple of per-element data leaf values
      th — (q,) gathered parameter values

    jit/vmap trace this Python interpreter once; runtime is pure XLA.
    """

    def run(node: Node, v, d, th, memo: dict):
        k = id(node)
        if k in memo:
            return memo[k]
        if isinstance(node, Const):
            out = node.value
        elif isinstance(node, VarNode):
            out = v[var_slots[node._skey()]]
        elif isinstance(node, ParamNode):
            out = th[par_slots[node._skey()]]
        elif isinstance(node, Data):
            out = d[data_slots[node._skey()]]
        elif isinstance(node, Unary):
            out = UNIVARIATE_OPS[node.op].fn(run(node.a, v, d, th, memo))
        elif isinstance(node, Binary):
            if (
                node.op == "pow"
                and isinstance(node.b, Const)
                and isinstance(node.b.value, int)
            ):
                # integer_pow: exact for negative bases, cheaper than exp/log
                out = run(node.a, v, d, th, memo) ** node.b.value
            else:
                out = BIVARIATE_OPS[node.op].fn(
                    run(node.a, v, d, th, memo), run(node.b, v, d, th, memo)
                )
        elif isinstance(node, NarySum):
            acc = None
            for c in node.children:
                t = run(c, v, d, th, memo)
                acc = t if acc is None else acc + t
            out = acc
        else:
            raise TypeError(f"cannot compile node {node!r}")
        memo[k] = out
        return out

    def f(v, d, th):
        return run(root, v, d, th, {})

    return f


# ---------------------------------------------------------------------------
# The compiled pattern
# ---------------------------------------------------------------------------


@dataclass
class CompiledPattern:
    """One traced template over one data table, with static sparsity.

    Invariant (parity with /root/reference/src/nlp.jl:1528-1530): element k
    contributes exactly `p` first-order entries and `o2step` Hessian entries;
    the global COO layout is fixed at build time.
    """

    tree: Node
    n: int  # number of elements
    p: int  # unique variable slots per element (o1step)
    q: int  # parameter slots per element
    o2step: int
    eval_fn: Callable  # f(v, d, th) -> scalar
    hess_entry_fn: Callable  # h(v, d, th) -> (o2step,) fused COO entries
    vidx: np.ndarray  # (n, p) int64 — global flat variable indices
    pidx: np.ndarray  # (n, q) int64 — global flat parameter indices
    data_cols: tuple  # tuple of (n,) numpy columns, data-slot order
    hpairs: np.ndarray  # (o2step, 2) slot pairs (canonical p >= q)

    def hess_coords(self):
        """Per-element Hessian COO coordinates (n, o2step) each, canonical
        lower triangle by *value* (runtime indices are data-dependent)."""
        if self.o2step == 0 or self.n == 0:
            z = np.zeros((self.n, 0), dtype=np.int64)
            return z, z
        vi = self.vidx[:, self.hpairs[:, 0]]
        vj = self.vidx[:, self.hpairs[:, 1]]
        rows = np.maximum(vi, vj)
        cols = np.minimum(vi, vj)
        return rows, cols

    def hess_diag_dup(self):
        """(n, o2step) float multiplier: 2.0 where a structurally off-diagonal
        pair lands on the matrix diagonal at runtime (both slots resolve to
        the same variable index), else 1.0 — matching the doubled-diagonal
        accumulation of /root/reference/src/hessian.jl:262-267."""
        if self.o2step == 0 or self.n == 0:
            return np.ones((self.n, 0))
        vi = self.vidx[:, self.hpairs[:, 0]]
        vj = self.vidx[:, self.hpairs[:, 1]]
        off_diag_pair = (self.hpairs[:, 0] != self.hpairs[:, 1])[None, :]
        return np.where(off_diag_pair & (vi == vj), 2.0, 1.0)


def trace_pattern(
    template: Callable | Node,
    data,
    *,
    extra_tables: Optional[dict] = None,
) -> CompiledPattern:
    """Trace `template` once over symbolic leaves and compile the pattern.

    `template` is a callable taking the element proxy (or a ready-made Node
    for singleton patterns with data=None).
    """
    table = DataTable.from_data(data)
    tables = {0: table}
    if extra_tables:
        tables.update(extra_tables)

    if isinstance(template, Node):
        tree = template
    else:
        proxy = Data(0, (), None)
        tree = template(proxy)
    if not isinstance(tree, Node):
        # template returned a plain number (constant pattern)
        tree = Const(float(tree))

    (
        var_leaves,
        var_slots,
        par_leaves,
        par_slots,
        data_leaves,
        data_slots,
    ) = _collect_leaves(tree)
    hpairs = _hessian_pairs(tree, var_slots)

    n = table.n
    p, q = len(var_leaves), len(par_leaves)
    memo: dict = {}
    vidx = (
        np.stack(
            [eval_index(vl.index, tables, n, memo) for vl in var_leaves], axis=1
        ).astype(np.int64)
        if p
        else np.zeros((n, 0), dtype=np.int64)
    )
    pidx = (
        np.stack(
            [eval_index(pl.index, tables, n, memo) for pl in par_leaves], axis=1
        ).astype(np.int64)
        if q
        else np.zeros((n, 0), dtype=np.int64)
    )
    data_cols = tuple(
        np.asarray(eval_index(dl, tables, n, memo)) for dl in data_leaves
    )

    eval_fn = make_eval_fn(tree, var_slots, par_slots, data_slots)
    hess_entry_fn = make_hess_entry_fn(
        tree, var_slots, par_slots, data_slots, hpairs
    )

    return CompiledPattern(
        tree=tree,
        n=n,
        p=p,
        q=q,
        o2step=len(hpairs),
        eval_fn=eval_fn,
        hess_entry_fn=hess_entry_fn,
        vidx=vidx,
        pidx=pidx,
        data_cols=data_cols,
        hpairs=np.asarray(hpairs, dtype=np.int64).reshape(len(hpairs), 2),
    )
