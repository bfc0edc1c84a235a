"""Vector/matrix algebra over expression nodes.

Parity with the reference's OptimalControl bridge
(/root/reference/ext/ExaModelsOptimalControl.jl:148-494), which expands
vector/matrix operations on node types into scalar expression trees so
function-based model definitions trace through linear algebra. Re-designed
for Python: `NodeArray` wraps a numpy object-array of `Node`s (or numbers)
with elementwise arithmetic and `@`; the free functions below produce
scalar nodes / NodeArrays via explicit expansion with `nary_sum` (shallow
reductions — no deep binary chains).
"""

from __future__ import annotations

import numpy as np

from ..core.graph import Node, as_node, nary_sum

__all__ = [
    "NodeArray",
    "dot",
    "matvec",
    "matmul",
    "norm",
    "cross",
    "trace",
    "diag",
    "diagm",
    "det",
    "concat",
]


def _obj_array(values) -> np.ndarray:
    if isinstance(values, NodeArray):
        return values.a
    arr = np.empty(np.shape(values), dtype=object)
    flat = arr.reshape(-1)
    src = np.asarray(values, dtype=object).reshape(-1)
    for i, v in enumerate(src):
        flat[i] = v
    return arr


class NodeArray:
    """A dense array of scalar expression nodes with numpy-style algebra."""

    def __init__(self, values):
        self.a = _obj_array(values)

    # -- shape ------------------------------------------------------------
    @property
    def shape(self):
        return self.a.shape

    @property
    def ndim(self):
        return self.a.ndim

    def __len__(self):
        return len(self.a)

    def __iter__(self):
        return iter(self.a)

    def __getitem__(self, idx):
        out = self.a[idx]
        return NodeArray(out) if isinstance(out, np.ndarray) else out

    # -- elementwise algebra ------------------------------------------------
    def _bin(self, other, fn):
        ob = other.a if isinstance(other, NodeArray) else other
        return NodeArray(fn(self.a, ob))

    def __add__(self, o):
        return self._bin(o, lambda a, b: a + b)

    __radd__ = __add__

    def __sub__(self, o):
        return self._bin(o, lambda a, b: a - b)

    def __rsub__(self, o):
        return self._bin(o, lambda a, b: b - a)

    def __mul__(self, o):
        return self._bin(o, lambda a, b: a * b)

    __rmul__ = __mul__

    def __truediv__(self, o):
        return self._bin(o, lambda a, b: a / b)

    def __neg__(self):
        return NodeArray(-self.a)

    def __pow__(self, p):
        return NodeArray(self.a**p)

    def __matmul__(self, o):
        ob = o.a if isinstance(o, NodeArray) else _obj_array(o)
        if self.ndim == 1 and ob.ndim == 1:
            return dot(self, o)
        if self.ndim == 2 and ob.ndim == 1:
            return matvec(self, o)
        return matmul(self, o)

    def __rmatmul__(self, o):
        return NodeArray(o) @ self

    # -- reductions -----------------------------------------------------------
    def sum(self):
        return nary_sum([as_node(v) for v in self.a.reshape(-1)])

    @property
    def T(self):
        return NodeArray(self.a.T)

    def apply(self, fn):
        """Elementwise scalar function (e.g. emath.sin)."""
        out = np.empty(self.a.shape, dtype=object)
        of, sf = out.reshape(-1), self.a.reshape(-1)
        for i, v in enumerate(sf):
            of[i] = fn(v)
        return NodeArray(out)

    def __repr__(self):
        return f"NodeArray(shape={self.shape})"


def _arr(x) -> np.ndarray:
    return x.a if isinstance(x, NodeArray) else _obj_array(x)


def dot(u, v) -> Node:
    """uᵀv as a shallow n-ary sum (ExaModelsOptimalControl.jl:197-214)."""
    ua, va = _arr(u).reshape(-1), _arr(v).reshape(-1)
    if ua.shape != va.shape:
        raise ValueError(f"dot shape mismatch {ua.shape} vs {va.shape}")
    return nary_sum([as_node(a * b) for a, b in zip(ua, va)])


def matvec(A, x) -> NodeArray:
    Aa, xa = _arr(A), _arr(x).reshape(-1)
    m, n = Aa.shape
    if n != xa.shape[0]:
        raise ValueError("matvec shape mismatch")
    out = np.empty(m, dtype=object)
    for i in range(m):
        out[i] = nary_sum([as_node(Aa[i, j] * xa[j]) for j in range(n)])
    return NodeArray(out)


def matmul(A, B) -> NodeArray:
    Aa, Ba = _arr(A), _arr(B)
    m, k = Aa.shape
    k2, n = Ba.shape
    if k != k2:
        raise ValueError("matmul shape mismatch")
    out = np.empty((m, n), dtype=object)
    for i in range(m):
        for j in range(n):
            out[i, j] = nary_sum(
                [as_node(Aa[i, p] * Ba[p, j]) for p in range(k)]
            )
    return NodeArray(out)


def norm(v, p=2) -> Node:
    """Euclidean (p=2), 1-norm via abs, or p-norm
    (ExaModelsOptimalControl.jl:418-447)."""
    from ..core.math import sqrt as _sqrt

    va = _arr(v).reshape(-1)
    if p == 2:
        return _sqrt(nary_sum([as_node(x) ** 2 for x in va]))
    if p == 1:
        return nary_sum([abs(as_node(x)) for x in va])
    return nary_sum([abs(as_node(x)) ** p for x in va]) ** (1.0 / p)


def cross(u, v) -> NodeArray:
    ua, va = _arr(u).reshape(-1), _arr(v).reshape(-1)
    if ua.shape[0] != 3 or va.shape[0] != 3:
        raise ValueError("cross requires length-3 vectors")
    return NodeArray(
        [
            ua[1] * va[2] - ua[2] * va[1],
            ua[2] * va[0] - ua[0] * va[2],
            ua[0] * va[1] - ua[1] * va[0],
        ]
    )


def trace(A) -> Node:
    Aa = _arr(A)
    n = min(Aa.shape)
    return nary_sum([as_node(Aa[i, i]) for i in range(n)])


def diag(A) -> NodeArray:
    Aa = _arr(A)
    n = min(Aa.shape)
    return NodeArray([Aa[i, i] for i in range(n)])


def diagm(v) -> NodeArray:
    va = _arr(v).reshape(-1)
    n = va.shape[0]
    out = np.full((n, n), 0.0, dtype=object)
    for i in range(n):
        out[i, i] = va[i]
    return NodeArray(out)


def det(A) -> Node:
    """Determinant by cofactor expansion — small matrices only, like the
    reference's specialized ≤4×4 + recursive fallback
    (ExaModelsOptimalControl.jl:449-494)."""
    Aa = _arr(A)
    n, n2 = Aa.shape
    if n != n2:
        raise ValueError("det requires a square matrix")
    if n > 6:
        raise ValueError("symbolic det limited to n<=6 (cofactor expansion)")
    if n == 1:
        return as_node(Aa[0, 0])
    if n == 2:
        return as_node(Aa[0, 0] * Aa[1, 1] - Aa[0, 1] * Aa[1, 0])
    terms = []
    for j in range(n):
        minor = np.delete(np.delete(Aa, 0, axis=0), j, axis=1)
        cof = as_node(Aa[0, j]) * det(NodeArray(minor))
        terms.append(cof if j % 2 == 0 else -cof)
    return nary_sum(terms)


def concat(*arrays) -> NodeArray:
    parts = [_arr(a).reshape(-1) for a in arrays]
    return NodeArray(np.concatenate(parts))
