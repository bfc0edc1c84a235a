"""Feature parity tests: lifted add_var generator form
(/root/reference/src/nlp.jl:939-957, test/NLPTest/feature_test.jl) and the
legacy API names (/root/reference/src/deprecated.jl, DeprecatedTest)."""

import warnings

import numpy as np
import pytest

import examodels_tpu as et
from examodels_tpu import ExaCore, ExaModel, madipm


class TestLiftedVar:
    def test_matches_manual_lift(self):
        """add_var(template, data) == explicit aux vars + equality rows."""
        n = 5

        # lifted form
        c1 = ExaCore()
        x1 = c1.add_var(n, start=0.5)
        z1 = c1.add_var(lambda i: x1[i] ** 2 + 1.0, range(n), start=1.25)
        c1.add_obj(lambda i: (z1[i] - 2.0) ** 2, range(n))
        m1 = ExaModel(c1)

        # manual lift
        c2 = ExaCore()
        x2 = c2.add_var(n, start=0.5)
        z2 = c2.add_var(n, start=1.25)
        c2.add_con(lambda i: z2[i] - (x2[i] ** 2 + 1.0), range(n))
        c2.add_obj(lambda i: (z2[i] - 2.0) ** 2, range(n))
        m2 = ExaModel(c2)

        assert m1.nvar == m2.nvar and m1.ncon == m2.ncon
        v = np.linspace(0.2, 1.4, m1.nvar)
        np.testing.assert_allclose(float(m1.obj(v)), float(m2.obj(v)), rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(m1.cons(v)), np.asarray(m2.cons(v)), rtol=1e-12
        )
        r1, r2 = madipm(m1, tol=1e-8), madipm(m2, tol=1e-8)
        assert r1.success and r2.success
        np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x), atol=1e-7)

    def test_struct_data(self):
        """Lifted var over tuple data rows."""
        c = ExaCore()
        x = c.add_var(4, start=1.0)
        rows = [(i, 0.5 * i) for i in range(4)]
        z = c.add_var(lambda d: x[d[0]] * d[1], rows)
        m = ExaModel(c)
        v = np.concatenate([np.full(4, 2.0), np.zeros(4)])
        want = -np.array([2.0 * 0.5 * i for i in range(4)])
        np.testing.assert_allclose(np.asarray(m.cons(v)), want, rtol=1e-12)


class TestLegacyAPI:
    def test_legacy_names_build_same_model(self):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            c = ExaCore()
            x = et.variable(c, 3, start=[0.1, 0.2, 0.3])
            p = et.parameter(c, [2.0])
            et.objective(c, lambda i: p[0] * x[i] ** 2, range(3))
            con = et.constraint(c, lambda i: x[i] + x[i + 1], range(2),
                                lcon=-1.0, ucon=1.0)
            et.constraint_aug(c, con, lambda i: (i, 0.5 * x[i] ** 2), range(2))
            s = et.subexpr(c, lambda i: x[i] ** 3, range(3))
            et.objective(c, lambda i: s[i], range(3))
        m = ExaModel(c)
        v = np.array([0.1, 0.2, 0.3])
        want_obj = 2.0 * (v**2).sum() + (v**3).sum()
        np.testing.assert_allclose(float(m.obj(v)), want_obj, rtol=1e-12)
        want_cons = np.array([v[0] + v[1] + 0.5 * v[0] ** 2,
                              v[1] + v[2] + 0.5 * v[1] ** 2])
        np.testing.assert_allclose(np.asarray(m.cons(v)), want_cons, rtol=1e-12)

    def test_warns(self):
        c = ExaCore()
        with pytest.deprecated_call():
            et.variable(c, 2)


class TestFusedHessJac:
    def test_matches_separate(self):
        from examodels_tpu.models import luksan_vlcek_model

        m = luksan_vlcek_model(30)
        rng = np.random.default_rng(0)
        x = np.asarray(m.x0) + 0.1 * rng.standard_normal(m.nvar)
        y = rng.standard_normal(m.ncon)
        h, j = m.hess_jac_coord(x, y, obj_weight=0.7)
        np.testing.assert_allclose(
            np.asarray(h), np.asarray(m.hess_coord(x, y, obj_weight=0.7)),
            rtol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(j), np.asarray(m.jac_coord(x)), rtol=1e-12
        )
