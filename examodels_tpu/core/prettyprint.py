"""Human-readable rendering of expression trees and model objects
(parity: /root/reference/src/prettyprint.jl): inline `node_str`, the
box-drawing `tree_str` (the reference's `_print_tree` family), and the
abbreviated-display toggle (`full_display`, the reference's
`fulltype_display!`, prettyprint.jl:3-20)."""

from __future__ import annotations

_INFIX = {"add": "+", "sub": "-", "mul": "*", "div": "/", "pow": "^",
          "mod": "%", "floordiv": "//"}

_PREC = {"add": 1, "sub": 1, "mul": 2, "div": 2, "mod": 2, "floordiv": 2,
         "pow": 3}

# abbreviated display: reprs truncate long expressions unless full display
# is toggled on (the reference's _FULLTYPE_DISPLAY Ref)
_FULL_DISPLAY = False
_ABBREV_LEN = 120


def full_display(on: bool = True) -> None:
    """Toggle untruncated expression rendering in handle reprs
    (parity: fulltype_display!, /root/reference/src/prettyprint.jl:20)."""
    global _FULL_DISPLAY
    _FULL_DISPLAY = bool(on)


def abbrev(s: str) -> str:
    """Truncate long expression strings unless full display is on."""
    if _FULL_DISPLAY or len(s) <= _ABBREV_LEN:
        return s
    return s[: _ABBREV_LEN - 1] + "…"


def node_str(node, prec: int = 0, names: dict | None = None) -> str:
    from .graph import Binary, Const, Data, NarySum, ParamNode, Unary, VarNode

    names = names or {}
    if isinstance(node, Const):
        v = node.value
        s = repr(v)
        return f"({s})" if isinstance(v, (int, float)) and v < 0 and prec > 0 else s
    if isinstance(node, Data):
        path = ".".join(str(p) for p in node._path) if node._path else "·"
        base = f"d{node._source}.{path}" if node._source else f"d.{path}"
        if node._idx is not None:
            base += f"[{node_str(node._idx, 0, names)}]"
        return base
    if isinstance(node, VarNode):
        nm = names.get(("var", node.block), f"x{node.block}")
        return f"{nm}[{node_str(node.index, 0, names)}]"
    if isinstance(node, ParamNode):
        nm = names.get(("par", node.block), f"θ{node.block}")
        return f"{nm}[{node_str(node.index, 0, names)}]"
    if isinstance(node, Unary):
        if node.op == "neg":
            return f"-{node_str(node.a, 3, names)}"
        return f"{node.op}({node_str(node.a, 0, names)})"
    if isinstance(node, Binary):
        if node.op in _INFIX:
            p = _PREC[node.op]
            s = (f"{node_str(node.a, p, names)} {_INFIX[node.op]} "
                 f"{node_str(node.b, p + 1, names)}")
            return f"({s})" if p < prec else s
        return f"{node.op}({node_str(node.a, 0, names)}, {node_str(node.b, 0, names)})"
    if isinstance(node, NarySum):
        inner = " + ".join(node_str(c, 1, names) for c in node.children)
        return f"({inner})" if prec > 1 else inner
    return f"<{type(node).__name__}>"


def _node_label(node, names: dict) -> tuple[str, tuple]:
    """(label, children) for the tree renderer."""
    from .graph import Binary, Const, Data, NarySum, ParamNode, Unary, VarNode

    if isinstance(node, Const):
        return repr(node.value), ()
    if isinstance(node, (Data, VarNode, ParamNode)):
        return node_str(node, 0, names), ()
    if isinstance(node, Unary):
        return node.op, (node.a,)
    if isinstance(node, Binary):
        return _INFIX.get(node.op, node.op), (node.a, node.b)
    if isinstance(node, NarySum):
        return "Σ", tuple(node.children)
    return f"<{type(node).__name__}>", ()


def tree_str(node, names: dict | None = None, *, max_depth: int = 12) -> str:
    """Multi-line box-drawing rendering of an expression tree
    (parity: the _print_tree family, /root/reference/src/prettyprint.jl:38+).

        >>> print(tree_str(tree))
        +
        ├── *
        │   ├── d.c2
        │   └── ^
        │       ├── x[d.i]
        │       └── 2
        └── ...
    """
    names = names or {}
    lines: list[str] = []

    def walk(n, prefix: str, branch: str, depth: int):
        label, children = _node_label(n, names)
        lines.append(prefix + branch + label)
        if depth >= max_depth and children:
            lines.append(
                prefix + ("    " if branch in ("", "└── ") else "│   ") + "…"
            )
            return
        child_prefix = prefix + (
            "" if branch == "" else ("    " if branch == "└── " else "│   ")
        )
        for k, ch in enumerate(children):
            last = k == len(children) - 1
            walk(ch, child_prefix, "└── " if last else "├── ", depth + 1)

    walk(node, "", "", 0)
    return "\n".join(lines)


def show_tree(obj) -> str:
    """tree_str of a handle with a traced pattern (Objective / Constraint /
    Expression / ConstraintAug) or of a raw Node."""
    pattern = getattr(obj, "pattern", None)
    node = pattern.tree if pattern is not None else obj
    return tree_str(node)
