"""Two-stage structure tests (parity: /root/reference/test/TwoStageTest/
TwoStageTest.jl) and wrapper tests (parity: /root/reference/test/UtilsTest)."""

import numpy as np
import pytest

import examodels_tpu as et
from examodels_tpu import (
    CompressedModel,
    EachScenario,
    TimedModel,
    TwoStageCore,
    TwoStageModel,
    WrapperModel,
    get_con_scen,
    get_nscen,
    get_var_scen,
    madipm,
    scenario_values,
)


def build_two_stage(ns=2, nv=2, nd=1):
    """The TwoStageTest objective-evaluation model
    (/root/reference/test/TwoStageTest/TwoStageTest.jl:62-85)."""
    theta_vals = [2.0, 3.0, 4.0, 5.0][:max(ns, 2)]
    c = TwoStageCore(ns)
    v = c.add_var(EachScenario(), nv, start=0.0, name="v")  # shape (ns, nv)
    d = c.add_var(nd, start=0.0, name="d")
    th = c.add_par(theta_vals, name="th")

    obj_data = [(i, j, i) for i in range(ns) for j in range(nv)]
    c.add_obj(lambda t: th[t[2]] * v[t[0], t[1]] ** 2, obj_data)
    con_data = [(i, j) for i in range(ns) for j in range(nv)]
    c.add_con(EachScenario(), lambda t: v[t[0], t[1]], con_data)
    return c, v, d, th


class TestTwoStage:
    def test_dims_and_tags(self):
        ns, nv, nd = 3, 2, 2
        c, v, d, th = build_two_stage(ns, nv, nd)
        m = TwoStageModel(c)
        assert m.nvar == ns * nv + nd
        assert m.ncon == ns * nv
        assert get_nscen(m) == ns
        tags = get_var_scen(m)
        assert (tags == 0).sum() == nd
        assert (tags == 1).sum() == nv
        # scenario-major contiguity: scenario 1 vars first
        assert list(np.nonzero(tags == 1)[0]) == [0, 1]
        assert list(np.nonzero(tags == 2)[0]) == [2, 3]
        ctags = get_con_scen(m)
        assert (ctags == 1).sum() == nv

    def test_objective_value(self):
        """obj = Σ_s Σ_j θ_s v_{s,j}² at the reference's test point → 85
        (TwoStageTest.jl:62-85)."""
        c, v, d, th = build_two_stage(2, 2, 1)
        m = TwoStageModel(c)
        x = np.array([1.0, 2.0, 3.0, 4.0, 0.5])
        assert abs(float(m.obj(x)) - 85.0) < 1e-12

    def test_scenario_slices(self):
        c, v, d, th = build_two_stage(2, 2, 1)
        m = TwoStageModel(c)
        x = np.array([1.0, 2.0, 3.0, 4.0, 0.5])
        np.testing.assert_array_equal(scenario_values(m, x, 1), [1.0, 2.0])
        np.testing.assert_array_equal(scenario_values(m, x, 2), [3.0, 4.0])
        np.testing.assert_array_equal(scenario_values(m, x, 0), [0.5])

    def test_typed_scenario_getters_setters(self):
        """Per-scenario start/bound/θ access (parity:
        /root/reference/src/two_stage.jl:290-409)."""
        c, v, d, th = build_two_stage(2, 2, 1)
        # one EachScenario parameter so θ carries scenario tags
        c.add_par(EachScenario(), [7.0, 8.0], name="load")
        m = TwoStageModel(c)

        et.set_scenario_start(m, 1, [1.5, 2.5])
        et.set_scenario_start(m, 0, [0.25])
        np.testing.assert_array_equal(
            np.asarray(et.get_scenario_start(m, 1)), [1.5, 2.5]
        )
        np.testing.assert_array_equal(
            np.asarray(et.get_scenario_start(m, 0)), [0.25]
        )
        np.testing.assert_array_equal(np.asarray(m.x0), [1.5, 2.5, 0, 0, 0.25])

        et.set_scenario_lvar(m, 2, [-3.0, -4.0])
        np.testing.assert_array_equal(
            np.asarray(et.get_scenario_lvar(m, 2)), [-3.0, -4.0]
        )
        et.set_scenario_uvar(m, 2, 9.0)  # scalar broadcast
        np.testing.assert_array_equal(
            np.asarray(et.get_scenario_uvar(m, 2)), [9.0, 9.0]
        )

        et.set_scenario_lcon(m, 1, [-1.0, -2.0])
        et.set_scenario_ucon(m, 1, [1.0, 2.0])
        np.testing.assert_array_equal(
            np.asarray(et.get_scenario_lcon(m, 1)), [-1.0, -2.0]
        )
        np.testing.assert_array_equal(
            np.asarray(et.get_scenario_ucon(m, 1)), [1.0, 2.0]
        )
        et.set_scenario_y0(m, 2, [0.5, 0.5])
        np.testing.assert_array_equal(
            np.asarray(et.get_scenario_y0(m, 2)), [0.5, 0.5]
        )

        # θ: first-stage params are the 2 'th' values; each scenario owns a
        # replicated copy of the 'load' block (two_stage.jl:182-190)
        np.testing.assert_array_equal(
            np.asarray(et.get_scenario_theta(m, 0)), [2.0, 3.0]
        )
        np.testing.assert_array_equal(
            np.asarray(et.get_scenario_theta(m, 1)), [7.0, 8.0]
        )
        et.set_scenario_theta(m, 2, [11.0, 12.0])
        np.testing.assert_array_equal(
            np.asarray(et.get_scenario_theta(m, 2)), [11.0, 12.0]
        )

        with pytest.raises(ValueError):
            et.set_scenario_start(m, 1, [1.0, 2.0, 3.0])

    def test_solve(self):
        """min Σ_s θ_s Σ_j (v_{s,j} − s)² + d², v free, one coupling con."""
        ns, nv = 3, 2
        c = TwoStageCore(ns)
        v = c.add_var(EachScenario(), nv, start=0.0)
        d = c.add_var(1, start=0.0)
        data = [(s, j) for s in range(ns) for j in range(nv)]
        c.add_obj(lambda t: (v[t[0], t[1]] - (t[0] + 1.0)) ** 2, data)
        c.add_obj(lambda i: d[i] ** 2, range(1))
        c.add_con(
            EachScenario(), lambda t: v[t[0], t[1]] - d[0],
            data, lcon=-10.0, ucon=10.0,
        )
        m = TwoStageModel(c)
        r = madipm(m, tol=1e-8)
        assert r.success
        for s in range(1, ns + 1):
            np.testing.assert_allclose(
                scenario_values(m, np.asarray(r.x), s), [float(s)] * nv, atol=1e-6
            )

    def test_scenario_sharded_evaluation(self):
        """Scenario-major layout means element sharding == scenario sharding:
        the sharded evaluator must reproduce the single-device oracle."""
        import jax

        from examodels_tpu.parallel import ShardedEvaluator, make_mesh

        if len(jax.devices()) < 2:
            pytest.skip("needs >=2 devices")
        ns = 8
        c = TwoStageCore(ns)
        v = c.add_var(EachScenario(), 3, start=0.5)
        data = [(s, j) for s in range(ns) for j in range(3)]
        c.add_obj(lambda t: (v[t[0], t[1]] - t[0]) ** 2, data)
        c.add_con(EachScenario(), lambda t: v[t[0], t[1]] ** 2, data)
        m = TwoStageModel(c)
        ev = ShardedEvaluator(m, make_mesh(8, "scen"), "scen")
        x = np.linspace(0.1, 1.0, m.nvar)
        np.testing.assert_allclose(float(ev.obj(x)), float(m.obj(x)), rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(ev.cons(x)), np.asarray(m.cons(x)), rtol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(ev.grad(x)), np.asarray(m.grad(x)), rtol=1e-12
        )


class TestWrappers:
    def _model(self):
        c = et.ExaCore()
        x = c.add_var(4, start=1.0)
        c.add_obj(lambda i: (x[i] - 1.5) ** 2 + x[i] * x[(i + 1) % 4], range(4))
        con = c.add_con(lambda i: x[i] ** 2 + x[i + 1], range(3))
        # duplicate-coordinate entries via augmentation
        c.add_con_aug(con, lambda i: (i, 2.0 * x[i] ** 2), range(3))
        return et.ExaModel(c)

    def test_timed(self):
        m = TimedModel(self._model())
        x = np.asarray(m.x0)
        m.obj(x)
        m.obj(x)
        m.grad(x)
        assert m.stats.calls["obj"] == 2
        assert m.stats.calls["grad"] == 1
        assert m.stats.time["obj"] > 0
        assert "obj" in repr(m)

    def test_compressed_merges_duplicates(self):
        inner = self._model()
        m = CompressedModel(inner)
        assert m.nnzj < inner.nnzj
        x = np.asarray(m.x0) + 0.3
        jr, jc = m.jac_structure()
        # dense Jacobians agree
        Ji = np.zeros((inner.ncon, inner.nvar))
        r0, c0 = inner.jac_structure()
        np.add.at(Ji, (np.asarray(r0), np.asarray(c0)), np.asarray(inner.jac_coord(x)))
        Jc = np.zeros_like(Ji)
        np.add.at(Jc, (np.asarray(jr), np.asarray(jc)), np.asarray(m.jac_coord(x)))
        np.testing.assert_allclose(Ji, Jc, rtol=1e-12)
        # unique coordinates
        keys = set(zip(map(int, jr), map(int, jc)))
        assert len(keys) == m.nnzj

    @pytest.mark.slow
    def test_wrapper_returns_numpy(self):
        m = WrapperModel(self._model())
        out = m.grad(m.x0)
        assert isinstance(out, np.ndarray)
        assert isinstance(m.x0, np.ndarray)
        r = madipm(m if False else m.inner, tol=1e-8)  # solve inner
        assert r.success


def test_always_on_counters():
    """Every model carries call counters (parity: NLPModels.Counters,
    /root/reference/src/nlp.jl:447,520) without the TimedModel wrapper."""
    import examodels_tpu as et

    c = et.ExaCore()
    x = c.add_var(3, start=0.5)
    c.add_obj(lambda i: (x[i] - 1.0) ** 2, range(3))
    c.add_con(lambda i: x[i] + x[i + 1], range(2))
    m = et.ExaModel(c)
    xv = np.asarray(m.x0)
    m.obj(xv); m.obj(xv); m.grad(xv); m.cons(xv)
    m.jac_coord(xv); m.hess_coord(xv, np.zeros(2))
    m.jprod(xv, xv); m.jtprod(xv, np.zeros(2)); m.hprod(xv, np.zeros(2), xv)
    m.hess_jac_coord(xv, np.zeros(2))
    assert m.counters == {
        "obj": 2, "cons": 1, "grad": 1, "jac": 1, "hess": 1,
        "hess_jac": 1, "jprod": 1, "jtprod": 1, "hprod": 1,
    }
