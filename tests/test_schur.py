"""Scenario Schur-complement KKT backend tests.

The reference leaves scenario-structure exploitation to external solvers
(/root/reference/docs/src/two_stage.jl:44-45); our build ships it. Ground
truth here is the dense condensed backend: both solve the identical
regularized augmented system, so answers must agree to solver precision.
"""

import numpy as np
import pytest

import examodels_tpu as et
from examodels_tpu import EachScenario, TwoStageCore, TwoStageModel, madipm
from examodels_tpu.solver.kkt import DenseKKT, build_structure
from examodels_tpu.solver.schur import ScenarioSchurKKT


def build_model(ns=4, nv=3, coupling=True):
    """Two-stage model exercising every block type: fs var, per-scenario
    vars, local eq + ineq rows touching fs vars, and (optionally) a
    coupling inequality row summing terms from every scenario."""
    c = TwoStageCore(ns)
    v = c.add_var(EachScenario(), nv, start=0.5)
    d = c.add_var(2, start=0.25, lvar=-5.0, uvar=5.0)
    data = [(s, j) for s in range(ns) for j in range(nv)]
    c.add_obj(
        lambda t: (v[t[0], t[1]] - 0.3 * (t[0] + 1)) ** 2
        + 0.1 * v[t[0], t[1]] * d[0],
        data,
    )
    c.add_obj(lambda i: 0.5 * d[i] ** 2, range(2))
    # local equality rows (one per scenario, touches fs var)
    eq_data = [(s,) for s in range(ns)]
    c.add_con(
        EachScenario(),
        lambda t: v[t[0], 0] + v[t[0], 1] ** 2 - d[1],
        eq_data,
        lcon=0.1,
        ucon=0.1,
    )
    # local inequality rows
    c.add_con(
        EachScenario(),
        lambda t: v[t[0], 2] ** 2 + 0.2 * v[t[0], 0],
        eq_data,
        lcon=-1.0,
        ucon=2.0,
    )
    if coupling:
        # coupling row: base on fs var, augmented with every scenario's term
        row = c.add_con(lambda i: 0.5 * d[0], range(1), lcon=-4.0, ucon=4.0)
        c.add_con_aug(
            row, lambda t: (0, 0.1 * v[t[0], t[1]] ** 2), data
        )
    return TwoStageModel(c)


def random_kkt_inputs(m, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    st = build_structure(m)
    n = st.n
    x = m.x0 + 0.05 * rng.standard_normal(m.nvar)
    y = rng.standard_normal(m.ncon)
    hv = np.asarray(m.hess_coord(x, y))
    jv = np.asarray(m.jac_coord(x))
    sigma = rng.uniform(0.5, 2.0, n)
    dw = np.full(n, 0.05)
    r1 = rng.standard_normal(n)
    r2 = rng.standard_normal(st.m)
    dt = jnp.float64
    return st, tuple(
        jnp.asarray(a, dtype=dt) for a in (hv, jv, sigma, dw)
    ) + (jnp.asarray(0.3, dtype=dt),) + tuple(
        jnp.asarray(a, dtype=dt) for a in (r1, r2)
    )


class TestSchurSolve:
    @pytest.mark.parametrize("coupling", [False, True])
    def test_matches_dense(self, coupling):
        m = build_model(ns=4, nv=3, coupling=coupling)
        st, args = random_kkt_inputs(m)
        dense = DenseKKT(st)
        schur = ScenarioSchurKKT(st, m._var_scen, m._con_scen, m.nscen)
        dv_d, dy_d, ok_d = dense.solve(*args)
        dv_s, dy_s, ok_s = schur.solve(*args)
        assert bool(ok_d) and bool(ok_s)
        np.testing.assert_allclose(np.asarray(dv_s), np.asarray(dv_d),
                                   rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(np.asarray(dy_s), np.asarray(dy_d),
                                   rtol=1e-7, atol=1e-9)

    def test_pd_detection(self):
        """An indefinite Hessian block must flip pd_ok off (the IPM's
        inertia-free regularization signal)."""
        import jax.numpy as jnp

        m = build_model(ns=2, nv=3, coupling=False)
        st, args = random_kkt_inputs(m)
        hv, jv, sigma, dw, dc, r1, r2 = args
        schur = ScenarioSchurKKT(st, m._var_scen, m._con_scen, m.nscen)
        bad_sigma = sigma - 50.0  # strongly negative diagonal
        _, _, ok = schur.solve(hv, jv, bad_sigma, jnp.zeros_like(dw), dc, r1, r2)
        assert not bool(ok)

    def test_rejects_cross_scenario_coupling(self):
        """A Hessian entry joining two scenarios breaks the arrowhead."""
        ns = 2
        c = TwoStageCore(ns)
        v = c.add_var(EachScenario(), 2, start=0.0)
        # v[0,0]*v[1,0]: scenario-1 x scenario-2 product
        c.add_obj(lambda i: v[0, 0] * v[1, 0] + v[i, 0] ** 2, range(ns))
        m = TwoStageModel(c)
        st = build_structure(m)
        with pytest.raises(ValueError, match="arrowhead|scenario"):
            ScenarioSchurKKT(st, m._var_scen, m._con_scen, m.nscen)


class TestSchurIPM:
    def test_ipm_matches_dense(self):
        m = build_model(ns=4, nv=3, coupling=True)
        r_dense = madipm(m, tol=1e-8, linear_solver="dense")
        r_schur = madipm(m, tol=1e-8, linear_solver="schur")
        assert r_dense.success and r_schur.success
        np.testing.assert_allclose(
            np.asarray(r_schur.x), np.asarray(r_dense.x), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(r_schur.y), np.asarray(r_dense.y), atol=1e-5
        )

    @pytest.mark.slow
    def test_auto_selected_for_large_two_stage(self):
        """Auto dispatch picks schur above dense_limit and still solves."""
        m = build_model(ns=8, nv=3, coupling=True)
        r = madipm(m, tol=1e-8, dense_limit=4)  # force the schur branch
        assert r.success

    def test_sharded_mesh_matches(self):
        import jax

        if len(jax.devices()) < 2:
            pytest.skip("needs >=2 devices")
        from examodels_tpu.parallel import make_mesh

        m = build_model(ns=8, nv=3, coupling=True)
        mesh = make_mesh(min(8, len(jax.devices())), "scen")
        r0 = madipm(m, tol=1e-8, linear_solver="schur")
        r1 = madipm(m, tol=1e-8, linear_solver="schur", mesh=mesh)
        assert r0.success and r1.success
        np.testing.assert_allclose(
            np.asarray(r1.x), np.asarray(r0.x), atol=1e-7
        )
