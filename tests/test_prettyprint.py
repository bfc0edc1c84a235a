"""Expression/model rendering tests (PrettyPrintTest parity,
/root/reference/test/PrettyPrintTest)."""

import examodels_tpu as et
from examodels_tpu import ExaCore
from examodels_tpu.core.prettyprint import node_str


class TestNodeStr:
    def test_arith(self):
        c = ExaCore()
        x = c.add_var(5, name="x")
        s = node_str(100 * (x[0] ** 2 - x[1]) ** 2 + (x[0] - 1) ** 2)
        assert "^" in s and "100" in s

    def test_ops_and_data(self):
        c = ExaCore()
        x = c.add_var(3, name="x")
        node = et.sin(x[1] - x[2]) * et.exp(x[0])
        s = node_str(node)
        assert s.startswith("sin(") and "exp(" in s

    def test_repr_does_not_crash(self):
        c = ExaCore()
        x = c.add_var(4, name="x")
        th = c.add_par([1.0, 2.0], name="t")
        c.add_obj(lambda i: th[0] * x[i] ** 2, range(4))
        con = c.add_con(lambda i: x[i] + x[i + 1], range(3), name="row")
        c.add_con_aug(con, lambda i: (i, et.cos(x[i])), range(3))
        d = c.describe()
        assert "min" in d and "s.t." in d and "aug" in d
        assert "row" in d
        assert "Objective" in repr(c.objs[0])
        assert "Constraint" in repr(con)


def test_tree_str_and_full_display():
    """Box-drawing tree rendering + abbreviated-display toggle
    (parity: _print_tree / fulltype_display!,
    /root/reference/src/prettyprint.jl)."""
    import examodels_tpu as et
    from examodels_tpu.core.prettyprint import abbrev

    c = et.ExaCore()
    x = c.add_var(5, name="x")
    con = c.add_con(lambda i: et.sin(x[i]) * x[i + 1] ** 2, range(3), name="g")
    t = et.show_tree(con)
    lines = t.splitlines()
    assert lines[0] == "*"
    assert any("sin" in ln for ln in lines)
    assert any("├──" in ln for ln in lines) and any("└──" in ln for ln in lines)
    # raw nodes render too
    assert "+" in et.tree_str(x[1] + 2.0)

    long = "z" * 500
    assert abbrev(long).endswith("…") and len(abbrev(long)) < 200
    et.full_display(True)
    try:
        assert abbrev(long) == long
    finally:
        et.full_display(False)
