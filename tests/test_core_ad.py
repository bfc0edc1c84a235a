"""Differential tests of the pattern-AD core against independent JAX AD.

Strategy (SURVEY.md §4 "transferable test architecture"): our structured
oracle path (per-pattern vmapped grad/hess scattered into COO + segment-sums)
is compared against whole-function jax.grad / jax.jacfwd / jax.hessian of the
assembled obj/cons callables, plus finite differences on small instances.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import examodels_tpu as et
from examodels_tpu import ExaCore, ExaModel
from examodels_tpu.core.math import sin, cos, exp, sqrt, log, esum


def coo_to_dense(rows, cols, vals, nrows, ncols, symmetric=False):
    out = np.zeros((nrows, ncols))
    np.add.at(out, (np.asarray(rows), np.asarray(cols)), np.asarray(vals))
    if symmetric:
        lower = np.tril(out, -1)
        out = out + lower.T
    return out


def check_model(model, x=None, y=None, rtol=1e-7, atol=1e-8):
    """All-oracle differential check for one model."""
    rng = np.random.default_rng(42)
    if x is None:
        x = np.asarray(model.x0) + 0.1 * rng.standard_normal(model.nvar)
    if y is None:
        y = rng.standard_normal(model.ncon) if model.ncon else np.zeros(0)
    x = jnp.asarray(x, dtype=model.dtype)
    y = jnp.asarray(y, dtype=model.dtype)
    st, th = model._static, model.theta

    # gradient: structured segment-sum path vs reverse AD of the whole obj
    g_struct = np.asarray(model.grad(x))
    g_ad = np.asarray(jax.grad(lambda xx: model._obj_impl(st, xx, th))(x))
    np.testing.assert_allclose(g_struct, g_ad, rtol=rtol, atol=atol)

    # Jacobian: COO -> dense vs jacfwd of the whole cons
    if model.ncon:
        jr, jc = model.jac_structure()
        jv = model.jac_coord(x)
        J_struct = coo_to_dense(jr, jc, jv, model.ncon, model.nvar)
        J_ad = np.asarray(jax.jacfwd(lambda xx: model._cons_impl(st, xx, th))(x))
        np.testing.assert_allclose(J_struct, J_ad, rtol=rtol, atol=atol)

        # matrix-free products
        v = rng.standard_normal(model.nvar)
        w = rng.standard_normal(model.ncon)
        np.testing.assert_allclose(
            np.asarray(model.jprod(x, v)), J_ad @ v, rtol=rtol, atol=atol
        )
        np.testing.assert_allclose(
            np.asarray(model.jtprod(x, w)), J_ad.T @ w, rtol=rtol, atol=atol
        )

    # Hessian of the Lagrangian: COO lower-tri -> dense sym vs jax.hessian
    hr, hc = model.hess_structure()
    assert (np.asarray(hr) >= np.asarray(hc)).all(), "lower triangle violated"
    obj_weight = 0.7
    hv = model.hess_coord(x, y, obj_weight=obj_weight)
    H_struct = coo_to_dense(hr, hc, hv, model.nvar, model.nvar, symmetric=True)

    def lag(xx):
        val = obj_weight * model._obj_impl(st, xx, th)
        if model.ncon:
            val = val + jnp.dot(y, model._cons_impl(st, xx, th))
        return val

    H_ad = np.asarray(jax.hessian(lag)(x))
    np.testing.assert_allclose(H_struct, H_ad, rtol=rtol, atol=atol)

    # hprod
    v = rng.standard_normal(model.nvar)
    np.testing.assert_allclose(
        np.asarray(model.hprod(x, y, v, obj_weight=obj_weight)),
        H_ad @ v,
        rtol=rtol,
        atol=atol,
    )
    return x, y


def luksan_vlcek(N=10, use_aug=True):
    c = ExaCore()
    x = c.add_var(
        N, start=[(-1.2 if i % 2 == 0 else 1.0) for i in range(N)], name="x"
    )
    c.add_obj(
        lambda i: 100.0 * (x[i - 1] ** 2 - x[i]) ** 2 + (x[i - 1] - 1.0) ** 2,
        range(1, N),
    )
    if use_aug:
        con = c.add_con(lambda i: 3 * x[i + 1] ** 3 + 2 * x[i + 2] - 5, range(N - 2))
        c.add_con_aug(
            con,
            lambda i: (
                i,
                sin(x[i + 1] - x[i + 2]) * sin(x[i + 1] + x[i + 2])
                + 4 * x[i + 1]
                - x[i] * exp(x[i] - x[i + 1])
                - 3,
            ),
            range(N - 2),
        )
    else:
        c.add_con(
            lambda i: 3 * x[i + 1] ** 3
            + 2 * x[i + 2]
            - 5
            + sin(x[i + 1] - x[i + 2]) * sin(x[i + 1] + x[i + 2])
            + 4 * x[i + 1]
            - x[i] * exp(x[i] - x[i + 1])
            - 3,
            range(N - 2),
        )
    return c, x


class TestLuksanVlcek:
    def test_plain(self):
        c, _ = luksan_vlcek(10, use_aug=False)
        check_model(ExaModel(c))

    def test_conaug(self):
        c, _ = luksan_vlcek(10, use_aug=True)
        check_model(ExaModel(c))

    def test_conaug_equals_plain(self):
        """conaug accumulation must produce identical cons/jac/hess values
        (parity: /root/reference/test/NLPTest/conaug_test.jl)."""
        m1 = ExaModel(luksan_vlcek(12, use_aug=False)[0])
        m2 = ExaModel(luksan_vlcek(12, use_aug=True)[0])
        rng = np.random.default_rng(0)
        x = np.asarray(m1.x0) + 0.05 * rng.standard_normal(m1.nvar)
        y = rng.standard_normal(m1.ncon)
        np.testing.assert_allclose(m1.cons(x), m2.cons(x), rtol=1e-12)
        J1 = coo_to_dense(*m1.jac_structure(), m1.jac_coord(x), m1.ncon, m1.nvar)
        J2 = coo_to_dense(*m2.jac_structure(), m2.jac_coord(x), m2.ncon, m2.nvar)
        np.testing.assert_allclose(J1, J2, rtol=1e-12, atol=1e-14)
        H1 = coo_to_dense(*m1.hess_structure(), m1.hess_coord(x, y), m1.nvar, m1.nvar, True)
        H2 = coo_to_dense(*m2.hess_structure(), m2.hess_coord(x, y), m2.nvar, m2.nvar, True)
        np.testing.assert_allclose(H1, H2, rtol=1e-12, atol=1e-14)

    def test_conaug_sugar_equals_pair_form(self):
        """`con[i] + expr` sugar == (i, expr) pair form: same nnz counts
        and identical values (the reference's `g[i] += expr` sugar test,
        /root/reference/test/NLPTest/conaug_test.jl vs
        /root/reference/src/nlp.jl:202-245)."""

        def build(sugar):
            c = ExaCore()
            x = c.add_var(6, start=0.3, name="x")
            con = c.add_con(lambda i: x[i] - 0.1, range(4), name="g")
            if sugar:
                c.add_con_aug(con, lambda i: con[i] + sin(x[i + 1]) * x[i], range(4))
                c.add_con_aug(con, lambda i: con[i + 1] - x[i] ** 2, range(3))
            else:
                c.add_con_aug(con, lambda i: (i, sin(x[i + 1]) * x[i]), range(4))
                c.add_con_aug(con, lambda i: (i + 1, -(x[i] ** 2)), range(3))
            return ExaModel(c)

        m1, m2 = build(True), build(False)
        assert m1.nnzj == m2.nnzj and m1.nnzh == m2.nnzh
        rng = np.random.default_rng(3)
        x = rng.standard_normal(6) * 0.4
        y = rng.standard_normal(4)
        np.testing.assert_allclose(m1.cons(x), m2.cons(x), rtol=1e-13)
        J1 = coo_to_dense(*m1.jac_structure(), m1.jac_coord(x), 4, 6)
        J2 = coo_to_dense(*m2.jac_structure(), m2.jac_coord(x), 4, 6)
        np.testing.assert_allclose(J1, J2, rtol=1e-13, atol=1e-15)
        H1 = coo_to_dense(*m1.hess_structure(), m1.hess_coord(x, y), 6, 6, True)
        H2 = coo_to_dense(*m2.hess_structure(), m2.hess_coord(x, y), 6, 6, True)
        np.testing.assert_allclose(H1, H2, rtol=1e-13, atol=1e-15)

        # mismatched handle is an error
        c = ExaCore()
        x = c.add_var(3)
        g1 = c.add_con(lambda i: x[i], range(2), name="g1")
        g2 = c.add_con(lambda i: x[i], range(2), name="g2")
        with pytest.raises(ValueError, match="augments"):
            c.add_con_aug(g1, lambda i: g2[i] + x[i] ** 2, range(2))


class TestOpCoverage:
    """Many-operator composite templates (ADTest analogue,
    /root/reference/test/ADTest/ADTest.jl:6-121)."""

    @pytest.mark.parametrize(
        "template",
        [
            lambda x, i: et.sin(x[i]) * et.cos(x[i + 1]) + et.tan(x[i]) / (2 + x[i + 1] ** 2),
            lambda x, i: et.exp(x[i]) + et.log(2 + x[i] ** 2) + et.log1p(x[i] ** 2),
            lambda x, i: et.sqrt(1 + x[i] ** 2) + et.cbrt(2 + x[i + 1]),
            lambda x, i: et.tanh(x[i]) * et.sinh(x[i + 1]) + et.cosh(x[i]),
            lambda x, i: et.asin(x[i] / 10) + et.acos(x[i + 1] / 10) + et.atan(x[i]),
            lambda x, i: et.atan2(x[i], 1 + x[i + 1] ** 2) + et.hypot(x[i], x[i + 1]),
            lambda x, i: x[i] ** 3 / x[i + 1] - x[i] ** -2 + 2.0 ** x[i],
            lambda x, i: et.sigmoid(x[i]) + et.erf(x[i + 1]) + et.logit((2 + x[i]) / 10),
            lambda x, i: et.abs2(x[i] - x[i + 1]) + et.inv(3 + x[i] ** 2),
            lambda x, i: et.max_(x[i] ** 2, 1.0) + et.min_(x[i + 1], -1.0) * x[i],
            lambda x, i: (x[i] + x[i + 1]) ** 1 + (x[i] * 1) + (x[i] - 0) + 0 * x[i + 1],
            lambda x, i: esum(x[i + k] ** 2 for k in range(3)) / 3.0,
        ],
    )
    def test_composite(self, template):
        N = 8
        c = ExaCore()
        x = c.add_var(N, start=0.5)
        c.add_obj(lambda i: template(x, i), range(N - 3))
        c.add_con(lambda i: template(x, i) * 0.5 + x[i], range(N - 3))
        m = ExaModel(c)
        rng = np.random.default_rng(7)
        xv = 0.5 + 0.1 * rng.standard_normal(N)
        check_model(m, x=xv, rtol=1e-6, atol=1e-7)


class TestDataAndParams:
    @pytest.mark.slow
    def test_tuple_data(self):
        # electrons-on-a-sphere style pair data
        np_ = 6
        itr = [(i, j) for i in range(np_ - 1) for j in range(i + 1, np_)]
        c = ExaCore()
        x = c.add_var(np_, start=0.3)
        y = c.add_var(np_, start=-0.2)
        c.add_obj(
            lambda d: 1.0 / sqrt((x[d[0]] - x[d[1]]) ** 2 + (y[d[0]] - y[d[1]]) ** 2 + 0.1),
            itr,
        )
        c.add_con(lambda i: x[i] ** 2 + y[i] ** 2 - 1, range(np_))
        check_model(ExaModel(c))

    @pytest.mark.slow
    def test_namedtuple_data_and_params(self):
        from collections import namedtuple

        Row = namedtuple("Row", ["i", "j", "w"])
        rows = [Row(0, 3, 2.0), Row(1, 2, -1.5), Row(2, 2, 0.7), Row(3, 0, 1.1)]
        c = ExaCore()
        x = c.add_var(4, start=1.0)
        th = c.add_par([0.5, 1.5, 2.5, 3.5], name="theta")
        c.add_obj(lambda r: r.w * exp(x[r.i] * x[r.j]) + th[r.i] * x[r.i] ** 2, rows)
        c.add_con(lambda r: th[r.j] * sin(x[r.i]) + x[r.j] ** 3, rows)
        m = ExaModel(c)
        check_model(m)

        # parameter update without retrace must change values correctly
        xv = np.asarray(m.x0)
        o1 = float(m.obj(xv))
        et.set_parameter(m, th, [1.0, 1.0, 1.0, 1.0])
        o2 = float(m.obj(xv))
        assert o1 != o2
        check_model(m)

    def test_runtime_index_collision_doubles_diagonal(self):
        """x[d.a]*x[d.b] where some rows have a == b: the cross-term Hessian
        entry lands on the diagonal and must count twice
        (parity: /root/reference/src/hessian.jl:262-267)."""
        data = {"a": np.array([0, 1, 2, 1]), "b": np.array([1, 1, 0, 3])}
        c = ExaCore()
        x = c.add_var(4, start=2.0)
        c.add_obj(lambda d: x[d.a] * x[d.b] + sin(x[d.a] * x[d.b]), data)
        check_model(ExaModel(c))

    def test_duplicate_slot_dedup(self):
        """x[i] appearing many times structurally must compress to one slot."""
        c = ExaCore()
        x = c.add_var(5, start=0.7)
        c.add_obj(lambda i: x[i] * x[i] + x[i] ** 3 + sin(x[i]) * x[i], range(5))
        m = ExaModel(c)
        # one unique slot per element -> nnzg == 5, nnzh == 5 (diagonal only)
        assert m.nnzg == 5
        assert m.nnzh == 5
        check_model(m)


class TestStructure:
    def test_linear_constraint_zero_hessian(self):
        """Purely linear patterns contribute zero Hessian NNZ
        (hrpass0 pruning parity, /root/reference/src/hessian.jl:382-517)."""
        c = ExaCore()
        x = c.add_var(6, start=1.0)
        c.add_obj(lambda i: (x[i] - 1.0) ** 2, range(6))
        c.add_con(lambda i: 2.0 * x[i] - 3.0 * x[i + 1] + 1.0, range(5))
        m = ExaModel(c)
        assert m.nnzj == 10
        assert m.nnzh == 6  # only the quadratic objective diagonal
        check_model(m)

    def test_finite_difference_anchor(self):
        """Third independent check: central finite differences."""
        c, _ = luksan_vlcek(6, use_aug=False)
        m = ExaModel(c)
        x = np.asarray(m.x0, dtype=np.float64)
        g = np.asarray(m.grad(x))
        h = 1e-6
        for k in range(m.nvar):
            e = np.zeros(m.nvar)
            e[k] = h
            fd = (float(m.obj(x + e)) - float(m.obj(x - e))) / (2 * h)
            assert abs(fd - g[k]) < 1e-5 * max(1.0, abs(g[k]))

    @pytest.mark.slow
    def test_empty_and_singleton(self):
        c = ExaCore()
        x = c.add_var(3, start=1.0)
        c.add_obj(x[2] ** 2 + x[0])  # bare-Node singleton objective
        con = c.add_con(shape=2)  # dims-only empty block
        c.add_con_aug(con, lambda i: (i, x[i] ** 2), range(2))
        m = ExaModel(c)
        assert m.ncon == 2
        check_model(m)


class TestSubexpression:
    def test_add_expr_inlining(self):
        """add_expr inlines the traced tree into consumers
        (parity: /root/reference/test/NLPTest/subexpr_test.jl:281-306)."""
        N = 6
        c = ExaCore()
        x = c.add_var(N, start=0.4)
        s = c.add_expr(lambda i: x[i] ** 2 + sin(x[i]), range(N))
        c.add_obj(lambda i: s[i] * s[i + 1] + exp(s[i]), range(N - 1))
        m = ExaModel(c)

        # hand-inlined equivalent
        c2 = ExaCore()
        x2 = c2.add_var(N, start=0.4)

        def sfun(i):
            return x2[i] ** 2 + sin(x2[i])

        c2.add_obj(lambda i: sfun(i) * sfun(i + 1) + exp(sfun(i)), range(N - 1))
        m2 = ExaModel(c2)

        rng = np.random.default_rng(3)
        xv = 0.4 + 0.1 * rng.standard_normal(N)
        np.testing.assert_allclose(float(m.obj(xv)), float(m2.obj(xv)), rtol=1e-12)
        np.testing.assert_allclose(m.grad(xv), m2.grad(xv), rtol=1e-12)
        check_model(m)
