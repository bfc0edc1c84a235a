"""AMPL ``.nl`` file ingestion — external flat-model frontend.

The reference ingests arbitrary flat models through MOI/JuMP and
re-SIMD-ifies them by pattern binning (/root/reference/ext/ExaModelsMOI.jl,
SURVEY.md §2.7/§3.5). There is no MOI in Python; the lingua franca for flat
NLP interchange here is the AMPL ``.nl`` format (D. Gay, "Writing .nl
Files", 2005) — emitted by AMPL, Pyomo, JuMP (``write_to_file``), CasADi,
and GAMS convert. This module reads the *text* (``g``) flavor and feeds the
rows one at a time into :class:`~examodels_tpu.bridge.flat.FlatCore`, whose
skeleton binning collapses structurally identical rows into batched SIMD
patterns — so a 100k-row ``.nl`` model executes as a handful of vmapped
kernels, exactly like a hand-templated model.

Supported: all smooth scalar opcodes (+ - * / pow abs uminus sqrt and the
trig/exp/log families), n-ary sumlist/minlist/maxlist, integer-power
shortcuts (OP1POW/OP2POW/OPCPOW), defined variables (``V`` segments, both
file-scope and per-row), variable/constraint bounds incl. ranges and free
rows, initial primal (``x``) and dual (``d``) points, linear Jacobian
(``J``)/gradient (``G``) segments, multiple objectives (summed, as in the
reference), and maximize sense. Rejected loudly: binary-format files,
complementarity rows, logical constraints, discrete variables, and
imported functions.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

from ..core.graph import Const, Node, as_node, make_binary, make_unary, nary_sum
from .flat import FlatCore

__all__ = ["read_nl", "nl_model"]

_INF = math.inf

# opcode -> (kind, name). Numbering is the ASL table (Gay 2005, §"Opcodes";
# same values every .nl writer emits).
_UNARY = {
    13: "floor", 14: "ceil", 15: "abs", 16: "neg",
    37: "tanh", 38: "tan", 39: "sqrt", 40: "sinh", 41: "sin",
    42: "log10", 43: "log", 44: "exp", 45: "cosh", 46: "cos",
    47: "atanh", 49: "atan", 50: "asinh", 51: "asin", 52: "acosh",
    53: "acos",
}
_BINARY = {
    # o4 is OPREM (TRUNCATED remainder, sign of dividend — not Python's
    # floored %) and o55 is OPintDIV (truncation toward zero, not floor):
    # mapped to the dedicated truncated ops (advisor finding r3).
    0: "add", 1: "sub", 2: "mul", 3: "div", 4: "rem", 5: "pow",
    48: "atan2", 55: "truncdiv",
}
_OP_SUMLIST, _OP_MINLIST, _OP_MAXLIST = 54, 11, 12
_OP_1POW, _OP_2POW, _OP_CPOW = 76, 77, 78  # expr^n, expr^2, n^expr
_OP_LESS = 6  # max(a-b, 0)


class _Tokens:
    """One whitespace token at a time over the segment body lines.

    .nl text expressions are one token per line, but some writers put the
    sumlist count on the same line — a flat token stream handles both.
    """

    def __init__(self, lines, pos):
        self._lines = lines
        self._line = pos
        self._buf: list = []
        self._bufpos = 0

    def _fill(self):
        while self._bufpos >= len(self._buf):
            if self._line >= len(self._lines):
                raise ValueError("unexpected end of .nl file inside expression")
            raw = self._lines[self._line]
            self._line += 1
            hash_ = raw.find("#")
            if hash_ >= 0:
                raw = raw[:hash_]
            self._buf = raw.split()
            self._bufpos = 0

    def next(self) -> str:
        self._fill()
        t = self._buf[self._bufpos]
        self._bufpos += 1
        return t

    def done_line(self) -> int:
        """Line index after the last consumed token (tokens must not span
        a partially consumed line when an expression ends — they never do:
        expressions are token-per-line and counts share the op line only)."""
        if self._bufpos < len(self._buf):
            raise ValueError("trailing tokens after expression")
        return self._line


def _parse_expr(tok: _Tokens, defined: dict) -> Node:
    """Recursive-descent prefix expression (one opcode/leaf per token)."""
    t = tok.next()
    c = t[0]
    if c == "n":
        return as_node(float(t[1:]))
    if c in "sl":  # short/long numeric forms (binary-format holdovers)
        return as_node(float(t[1:]))
    if c == "v":
        i = int(t[1:])
        if i in defined:
            return defined[i]
        return _VarRef(i)
    if c == "o":
        op = int(t[1:])
        if op in _UNARY:
            return make_unary(_UNARY[op], _parse_expr(tok, defined))
        if op in _BINARY:
            a = _parse_expr(tok, defined)
            b = _parse_expr(tok, defined)
            return make_binary(_BINARY[op], a, b)
        if op == _OP_SUMLIST:
            k = int(tok.next())
            return nary_sum(tuple(_parse_expr(tok, defined) for _ in range(k)))
        if op in (_OP_MINLIST, _OP_MAXLIST):
            k = int(tok.next())
            name = "min" if op == _OP_MINLIST else "max"
            out = _parse_expr(tok, defined)
            for _ in range(k - 1):
                out = make_binary(name, out, _parse_expr(tok, defined))
            return out
        if op == _OP_2POW:
            return make_binary("pow", _parse_expr(tok, defined), as_node(2.0))
        if op == _OP_1POW:
            a = _parse_expr(tok, defined)
            return make_binary("pow", a, _parse_expr(tok, defined))
        if op == _OP_CPOW:
            a = _parse_expr(tok, defined)
            return make_binary("pow", a, _parse_expr(tok, defined))
        if op == _OP_LESS:
            a = _parse_expr(tok, defined)
            b = _parse_expr(tok, defined)
            return make_binary("max", make_binary("sub", a, b), as_node(0.0))
        raise ValueError(
            f"unsupported .nl opcode o{op} (near line {tok.done_line()})"
        )
    if c == "f":
        raise ValueError(
            ".nl imported functions (f segments) are not supported "
            f"(near line {tok.done_line()})"
        )
    raise ValueError(
        f"unexpected .nl token {t!r} (near line {tok.done_line()})"
    )


class _VarRef(Node):
    """Placeholder leaf for `v<i>`; rewritten to `x[i]` once the FlatCore
    variable block exists (the header is parsed before any expression, but
    keeping leaves symbolic keeps _parse_expr independent of the builder)."""

    __slots__ = ("i",)

    def __init__(self, i: int):
        object.__setattr__(self, "i", i)

    def _make_skey(self) -> tuple:
        return ("nlvar", self.i)


def _substitute(node, x):
    if isinstance(node, _VarRef):
        return x[node.i]
    from ..core.graph import Binary, NarySum, Unary

    if isinstance(node, Unary):
        return make_unary(node.op, _substitute(node.a, x))
    if isinstance(node, Binary):
        return make_binary(node.op, _substitute(node.a, x), _substitute(node.b, x))
    if isinstance(node, NarySum):
        return nary_sum(tuple(_substitute(c, x) for c in node.children))
    return node


def _bound_row(parts):
    """Decode one `r`/`b` segment line -> (lo, hi)."""
    k = int(parts[0])
    if k == 0:
        return float(parts[1]), float(parts[2])
    if k == 1:
        return -_INF, float(parts[1])
    if k == 2:
        return float(parts[1]), _INF
    if k == 3:
        return -_INF, _INF
    if k == 4:
        v = float(parts[1])
        return v, v
    raise ValueError(
        f"unsupported .nl bound type {k} (complementarity rows are not supported)"
    )


def read_nl(source: str):
    """Parse ``.nl`` text (a path or the file contents) into a dict of raw
    model pieces: nvar/ncon/nobj, bounds, starts, per-row expressions (with
    ``_VarRef`` leaves), linear terms, and objective sense."""
    text = source
    if "\n" not in source:
        with open(source) as f:
            text = f.read()
    lines = text.splitlines()
    if not lines or lines[0][:1] not in "gb":
        raise ValueError("not a .nl file (missing g/b header)")
    if lines[0][0] == "b":
        raise ValueError("binary .nl files are not supported; write text format (g)")

    def ints(s):
        return [int(float(v)) for v in s.split("#")[0].split()]

    hdr2 = ints(lines[1])
    nvar, ncon, nobj = hdr2[0], hdr2[1], hdr2[2]
    hdr6 = ints(lines[5])  # .. nfunc arith flags
    hdr7 = ints(lines[6])  # discrete: nbv niv nlvbi nlvci nlvoi
    if len(hdr7) >= 2 and (hdr7[0] or hdr7[1] or any(hdr7[2:5])):
        raise ValueError(".nl discrete variables are not supported (NLP only)")
    if len(ints(lines[2])) > 2 and ints(lines[2])[2] > 0:
        raise ValueError(".nl complementarity constraints are not supported")

    con_nl: dict = {i: None for i in range(ncon)}
    obj_nl: list = []
    obj_sense: list = []
    con_lin: dict = {i: [] for i in range(ncon)}
    obj_lin: dict = {}
    lvar = np.full(nvar, -_INF)
    uvar = np.full(nvar, _INF)
    lcon = np.zeros(ncon)
    ucon = np.zeros(ncon)
    x0 = np.zeros(nvar)
    y0 = np.zeros(ncon)
    defined: dict = {}

    i = 10  # header is exactly 10 lines
    nL = len(lines)
    try:
        while i < nL:
            raw = lines[i].split("#")[0]
            if not raw.strip():
                i += 1
                continue
            tag = raw[0]
            parts = raw[1:].split()
            if tag == "C":
                tok = _Tokens(lines, i + 1)
                con_nl[int(parts[0])] = _parse_expr(tok, defined)
                i = tok.done_line()
            elif tag == "O":
                tok = _Tokens(lines, i + 1)
                obj_sense.append(int(parts[1]))
                obj_nl.append(_parse_expr(tok, defined))
                i = tok.done_line()
            elif tag == "V":
                # V <idx> <nlin> <where>; linear terms then an expression.
                idx, nlin = int(parts[0]), int(parts[1])
                terms = []
                for k in range(nlin):
                    v, cstr = lines[i + 1 + k].split("#")[0].split()
                    terms.append((int(v), float(cstr)))
                tok = _Tokens(lines, i + 1 + nlin)
                e = _parse_expr(tok, defined)
                i = tok.done_line()
                for v, cf in terms:
                    base = defined[v] if v in defined else _VarRef(v)
                    e = make_binary("add", e, make_binary("mul", as_node(cf), base))
                defined[idx] = e
            elif tag == "J":
                r, n = int(parts[0]), int(parts[1])
                for k in range(n):
                    v, cstr = lines[i + 1 + k].split("#")[0].split()
                    cf = float(cstr)
                    if cf != 0.0:
                        con_lin[r].append((int(v), cf))
                i += 1 + n
            elif tag == "G":
                o, n = int(parts[0]), int(parts[1])
                lst = obj_lin.setdefault(o, [])
                for k in range(n):
                    v, cstr = lines[i + 1 + k].split("#")[0].split()
                    cf = float(cstr)
                    if cf != 0.0:
                        lst.append((int(v), cf))
                i += 1 + n
            elif tag == "x":
                n = int(parts[0])
                for k in range(n):
                    v, val = lines[i + 1 + k].split("#")[0].split()
                    x0[int(v)] = float(val)
                i += 1 + n
            elif tag == "d":
                n = int(parts[0])
                for k in range(n):
                    v, val = lines[i + 1 + k].split("#")[0].split()
                    y0[int(v)] = float(val)
                i += 1 + n
            elif tag == "r":
                for k in range(ncon):
                    lcon[k], ucon[k] = _bound_row(lines[i + 1 + k].split("#")[0].split())
                i += 1 + ncon
            elif tag == "b":
                for k in range(nvar):
                    lvar[k], uvar[k] = _bound_row(lines[i + 1 + k].split("#")[0].split())
                i += 1 + nvar
            elif tag == "k":
                i += 1 + int(parts[0])  # column pointers: sparsity bookkeeping only
            elif tag == "S":
                # suffix segment "S<kind> <n> <name>": n data lines follow. The
                # count is parts[1]; parts[2] is the suffix NAME (advisor r3).
                i += 1 + int(parts[1])
            elif tag == "F":
                raise ValueError(".nl imported functions (F segments) are not supported")
            elif tag == "L":
                raise ValueError(".nl logical constraints are not supported")
            else:
                raise ValueError(f"unknown .nl segment {tag!r} at line {i + 1}")
    except (ValueError, IndexError) as e:
        # surface the failing segment + 1-based line so a malformed .nl
        # points at its own text instead of a bare mid-stream error
        if "[.nl line" in str(e):
            raise
        raise ValueError(
            f"{e} [.nl line {i + 1}: {lines[i][:60]!r}]"
        ) from e

    if len(hdr6) >= 2 and hdr6[1] > 0:
        raise ValueError(".nl imported functions are not supported")
    return {
        "nvar": nvar, "ncon": ncon, "nobj": nobj,
        "lvar": lvar, "uvar": uvar, "x0": x0, "y0": y0,
        "lcon": lcon, "ucon": ucon,
        "con_nl": con_nl, "con_lin": con_lin,
        "obj_nl": obj_nl, "obj_lin": obj_lin, "obj_sense": obj_sense,
    }


def nl_flatcore(source: str) -> FlatCore:
    """Parse ``.nl`` and populate a :class:`FlatCore` (rows unbinned yet —
    call ``.build()``/``.to_core()`` to pattern-bin and freeze)."""
    d = read_nl(source)
    minimize = not (d["obj_sense"] and d["obj_sense"][0] == 1)
    f = FlatCore(minimize=minimize)
    x = f.add_var(d["nvar"], start=d["x0"], lvar=d["lvar"], uvar=d["uvar"], name="x")

    def lin_node(terms):
        return [make_binary("mul", as_node(cf), x[v]) for v, cf in terms]

    for r in range(d["ncon"]):
        e = d["con_nl"][r]
        pieces = [] if e is None or isinstance(e, Const) and e.value == 0.0 \
            else [_substitute(e, x)]
        pieces += lin_node(d["con_lin"][r])
        if not pieces:
            pieces = [as_node(0.0)]
        expr = pieces[0] if len(pieces) == 1 else nary_sum(tuple(pieces))
        f.add_con_expr(expr, lcon=d["lcon"][r], ucon=d["ucon"][r])

    for o, e in enumerate(d["obj_nl"]):
        sgn = -1.0 if (d["obj_sense"][o] == 1) != (not minimize) else 1.0
        body = _substitute(e, x)
        if sgn < 0:
            body = make_unary("neg", body)
        if not (isinstance(e, Const) and e.value == 0.0):
            f.add_obj_expr(body)
        for v, cf in d["obj_lin"].get(o, []):
            f.add_obj_expr(make_binary("mul", as_node(sgn * cf), x[v]))
    return f


def nl_model(source: str, **kw):
    """``.nl`` file -> :class:`ExaModel` via FlatCore pattern binning.

    >>> model = nl_model("hs071.nl")
    >>> from examodels_tpu.solver import madipm
    >>> madipm(model).objective
    """
    return nl_flatcore(source).build(**kw)
