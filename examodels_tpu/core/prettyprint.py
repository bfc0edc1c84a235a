"""Human-readable rendering of expression trees and model objects
(parity: /root/reference/src/prettyprint.jl)."""

from __future__ import annotations

_INFIX = {"add": "+", "sub": "-", "mul": "*", "div": "/", "pow": "^",
          "mod": "%", "floordiv": "//"}

_PREC = {"add": 1, "sub": 1, "mul": 2, "div": 2, "mod": 2, "floordiv": 2,
         "pow": 3}


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
