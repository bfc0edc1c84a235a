"""Frontend-bridge tests.

FlatCore: parity with the MOI/JuMP ingestion path (pattern binning,
/root/reference/ext/ExaModelsMOI.jl:26-59,384-402) — a flat row-at-a-time
model must produce the same NLP as the equivalent hand-written pattern
model. linalg: parity with the OptimalControl vector/matrix node algebra
(/root/reference/ext/ExaModelsOptimalControl.jl:148-494,
/root/reference/test/LinAlgTest/LinAlgTest.jl).
"""

import numpy as np
import pytest

import examodels_tpu as et
from examodels_tpu import ExaCore, ExaModel, madipm
from examodels_tpu.bridge import (
    FlatCore,
    NodeArray,
    cross,
    det,
    diag,
    diagm,
    dot,
    matmul,
    matvec,
    norm,
    trace,
)
from examodels_tpu.core.math import exp, sin


def lv_pattern_model(n=10):
    c = ExaCore()
    x = c.add_var(n, start=[(-1.2 if i % 2 == 0 else 1.0) for i in range(n)])
    c.add_obj(
        lambda i: 100.0 * (x[i - 1] ** 2 - x[i]) ** 2 + (x[i - 1] - 1.0) ** 2,
        range(1, n),
    )
    c.add_con(
        lambda i: 3 * x[i + 1] ** 3
        + 2 * x[i + 2]
        - 5
        + sin(x[i + 1] - x[i + 2]) * sin(x[i + 1] + x[i + 2])
        + 4 * x[i + 1]
        - x[i] * exp(x[i] - x[i + 1])
        - 3,
        range(n - 2),
    )
    return ExaModel(c)


def lv_flat_model(n=10):
    f = FlatCore()
    x = f.add_var(n, start=[(-1.2 if i % 2 == 0 else 1.0) for i in range(n)])
    for i in range(1, n):
        f.add_obj_expr(
            100.0 * (x[i - 1] ** 2 - x[i]) ** 2 + (x[i - 1] - 1.0) ** 2
        )
    for i in range(n - 2):
        f.add_con_expr(
            3 * x[i + 1] ** 3
            + 2 * x[i + 2]
            - 5
            + sin(x[i + 1] - x[i + 2]) * sin(x[i + 1] + x[i + 2])
            + 4 * x[i + 1]
            - x[i] * exp(x[i] - x[i + 1])
            - 3,
        )
    return f


class TestFlatCore:
    def test_matches_pattern_model(self):
        n = 10
        mp = lv_pattern_model(n)
        mf = lv_flat_model(n).build()
        assert mf.nvar == mp.nvar and mf.ncon == mp.ncon
        rng = np.random.default_rng(3)
        x = rng.standard_normal(n) * 0.3
        y = rng.standard_normal(mp.ncon)
        np.testing.assert_allclose(float(mf.obj(x)), float(mp.obj(x)), rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(mf.grad(x)), np.asarray(mp.grad(x)), rtol=1e-9, atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(mf.cons(x)), np.asarray(mp.cons(x)), rtol=1e-9, atol=1e-12
        )
        # dense Jacobian / Hessian agreement (COO layouts differ)
        def dense_jac(m):
            r, c = m.jac_structure()
            J = np.zeros((m.ncon, m.nvar))
            np.add.at(J, (np.asarray(r), np.asarray(c)), np.asarray(m.jac_coord(x)))
            return J

        def dense_hess(m):
            r, c = m.hess_structure()
            H = np.zeros((m.nvar, m.nvar))
            v = np.asarray(m.hess_coord(x, y))
            np.add.at(H, (np.asarray(r), np.asarray(c)), v)
            off = np.asarray(r) != np.asarray(c)
            np.add.at(H, (np.asarray(c)[off], np.asarray(r)[off]), v[off])
            return H

        np.testing.assert_allclose(dense_jac(mf), dense_jac(mp), rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(dense_hess(mf), dense_hess(mp), rtol=1e-9, atol=1e-12)

    def test_binning_collapses_patterns(self):
        """1000 structurally identical flat rows -> O(1) patterns."""
        n = 300
        f = FlatCore()
        x = f.add_var(n, start=0.5)
        for i in range(n - 1):
            f.add_con_expr(x[i] * x[i + 1] - 1.0, lcon=0.0, ucon=0.0)
            f.add_obj_expr((x[i] - float(i + 1) / n) ** 2)
        core = f.to_core()
        # one product bin + one constant bin
        assert len(core.conaugs) == 2
        assert len(core.objs) == 1
        m = ExaModel(core)
        # constants stay in the rows (cons parity with pattern models)
        assert float(np.asarray(m.lcon)[0]) == 0.0
        x0 = np.full(n, 0.5)
        np.testing.assert_allclose(
            np.asarray(m.cons(x0)), 0.25 - 1.0, rtol=1e-12
        )

    @pytest.mark.slow
    def test_solves_same_as_pattern(self):
        mp = lv_pattern_model(10)
        mf = lv_flat_model(10).build()
        rp = madipm(mp, tol=1e-8)
        rf = madipm(mf, tol=1e-8)
        assert rp.success and rf.success
        np.testing.assert_allclose(np.asarray(rf.x), np.asarray(rp.x), atol=1e-7)

    def test_mixed_structures_bin_separately(self):
        f = FlatCore()
        x = f.add_var(6, start=1.0)
        f.add_con_expr(x[0] ** 2 + x[1], lcon=0.0, ucon=1.0)
        f.add_con_expr(x[2] ** 2 + x[3], lcon=0.0, ucon=1.0)
        f.add_con_expr(sin(x[4]) * x[5])
        f.add_obj_expr(x[0] ** 2)
        core = f.to_core()
        # term-level binning: x^2 bin, bare-x bin, sin-product bin
        assert len(core.conaugs) == 3
        m = ExaModel(core)
        x0 = np.arange(1.0, 7.0) * 0.2
        np.testing.assert_allclose(
            np.asarray(m.cons(x0)),
            [
                x0[0] ** 2 + x0[1],
                x0[2] ** 2 + x0[3],
                np.sin(x0[4]) * x0[5],
            ],
            rtol=1e-12,
        )

    def test_rejects_data_leaves_and_double_build(self):
        f = FlatCore()
        x = f.add_var(3, start=0.0)
        f.add_obj_expr(x[0] ** 2)
        f.to_core()
        with pytest.raises(RuntimeError):
            f.to_core()


class TestLinAlg:
    def _model(self, build):
        """Helper: objective from a node-algebra expression over 4 vars."""
        c = ExaCore()
        x = c.add_var(4, start=[0.3, -0.4, 0.8, 1.1])
        expr = build([x[i] for i in range(4)])
        c.add_obj(lambda i: expr, range(1))
        return ExaModel(c), np.array([0.3, -0.4, 0.8, 1.1])

    def test_dot_and_norm(self):
        m, x0 = self._model(
            lambda xs: dot(xs, [1.0, 2.0, 3.0, 4.0]) + norm(xs) ** 2
        )
        want = x0 @ [1, 2, 3, 4] + x0 @ x0
        np.testing.assert_allclose(float(m.obj(x0)), want, rtol=1e-12)

    def test_matvec_matmul_trace_diag(self):
        A = np.arange(1.0, 17.0).reshape(4, 4)
        m, x0 = self._model(
            lambda xs: dot(matvec(A, xs), xs)
            + trace(NodeArray(A))
            + dot(diag(NodeArray(A)), [1.0] * 4)
        )
        want = x0 @ A @ x0 + np.trace(A) + np.diag(A).sum()
        np.testing.assert_allclose(float(m.obj(x0)), want, rtol=1e-12)
        # matmul on numeric NodeArrays (entries fold to Const nodes)
        B = matmul(NodeArray(A), NodeArray(A))
        vals = np.array(
            [[float(getattr(v, "value", v)) for v in row] for row in B.a]
        )
        np.testing.assert_allclose(vals, A @ A, rtol=1e-12)

    def test_cross_det_diagm(self):
        m, x0 = self._model(
            lambda xs: dot(
                cross(xs[:3], [1.0, 0.5, -2.0]), [1.0, 1.0, 1.0]
            )
            + det(diagm(xs))
        )
        want = np.cross(x0[:3], [1.0, 0.5, -2.0]).sum() + np.prod(x0)
        np.testing.assert_allclose(float(m.obj(x0)), want, rtol=1e-10)

    def test_det_matches_numpy(self):
        rng = np.random.default_rng(0)
        for n in (1, 2, 3, 4, 5):
            A = rng.standard_normal((n, n))
            d = det(NodeArray(A))
            np.testing.assert_allclose(float(d.value) if hasattr(d, "value")
                                       else float(d), np.linalg.det(A),
                                       rtol=1e-9, atol=1e-12)

    def test_nodearray_algebra_and_gradients(self):
        """AD through the node-algebra expansion (LinAlgTest vs ForwardDiff
        analogue — here vs numpy finite differences)."""
        c = ExaCore()
        x = c.add_var(3, start=[0.5, 1.0, -0.7])
        A = np.array([[2.0, 1.0, 0.0], [1.0, 3.0, 1.0], [0.0, 1.0, 4.0]])

        xs = NodeArray([x[0], x[1], x[2]])
        quad = dot(matvec(A, xs), xs)  # xᵀAx
        c.add_obj(lambda i: quad, range(1))
        m = ExaModel(c)
        x0 = np.array([0.5, 1.0, -0.7])
        g = np.asarray(m.grad(x0))
        np.testing.assert_allclose(g, (A + A.T) @ x0, rtol=1e-9)
