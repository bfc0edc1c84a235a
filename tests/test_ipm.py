"""Solver-level tests: the analogue of the reference's NLPTest solve checks
(/root/reference/test/NLPTest/NLPTest.jl:116-126 — solve with ipopt/madnlp,
compare solutions/multipliers) using our on-device IPM and the Ipopt anchor
solutions recorded in the reference docs."""

import numpy as np
import pytest

import examodels_tpu as et
from examodels_tpu import madipm
from examodels_tpu.models import (
    LUKSAN_VLCEK_10_MULTIPLIERS,
    LUKSAN_VLCEK_10_SOLUTION,
    ac_opf_model,
    camshape_model,
    catmix_model,
    chain_model,
    elec_model,
    luksan_vlcek_model,
    steering_model,
    torsion_model,
)


class TestLuksanVlcekAnchors:
    """Exact agreement with the Ipopt reference solution
    (/root/reference/docs/src/develop.md:75-107)."""

    def test_n10_solution_and_multipliers(self):
        m = luksan_vlcek_model(10)
        r = madipm(m, tol=1e-8)
        assert r.status == "first_order"
        np.testing.assert_allclose(
            np.asarray(r.x), LUKSAN_VLCEK_10_SOLUTION, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(r.y), LUKSAN_VLCEK_10_MULTIPLIERS, atol=1e-6
        )

    def test_conaug_same_solve(self):
        m = luksan_vlcek_model(10, use_aug=True)
        r = madipm(m, tol=1e-8)
        assert r.status == "first_order"
        np.testing.assert_allclose(
            np.asarray(r.x), LUKSAN_VLCEK_10_SOLUTION, atol=1e-6
        )

    def test_solution_accessor(self):
        m = luksan_vlcek_model(10)
        r = madipm(m, tol=1e-8)
        x = et.solution(r, m.core.refs["x"])
        assert x.shape == (10,)
        y = et.multipliers(r, m.core.refs["s"])
        assert y.shape == (8,)

    def test_kkt_backends_agree(self):
        m = luksan_vlcek_model(30)
        r1 = madipm(m, tol=1e-8, linear_solver="dense")
        r2 = madipm(m, tol=1e-8, linear_solver="blocktri")
        assert r1.status == r2.status == "first_order"
        np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x), atol=1e-8)


class TestModelZoo:
    """Objective-value anchors: published COPS 3.0 optima where known,
    plus first-order status on every family."""

    @pytest.mark.parametrize(
        "name,build,obj_ref,atol",
        [
            # Thomson problem minimal energy for np=25 (COPS 3.0 table)
            pytest.param("elec25", lambda: elec_model(25), 243.8128,
                         1e-2, marks=pytest.mark.slow),
            pytest.param("chain", lambda: chain_model(204), 5.0723,
                         1e-3, marks=pytest.mark.slow),
            ("catmix", lambda: catmix_model(50), -0.048055, 1e-3),
            # particle steering min time
            pytest.param("steering", lambda: steering_model(50), 0.5546,
                         1e-3, marks=pytest.mark.slow),
            pytest.param("camshape", lambda: camshape_model(50), -4.2952,
                         2e-2, marks=pytest.mark.slow),
            pytest.param("torsion", lambda: torsion_model(12, 12), None,
                         None, marks=pytest.mark.slow),
        ],
    )
    def test_solves(self, name, build, obj_ref, atol):
        m = build()
        r = madipm(m, tol=1e-8, max_iter=200)
        assert r.success, f"{name}: {r.status}"
        if obj_ref is not None:
            assert abs(r.objective - obj_ref) < atol, (
                f"{name}: obj {r.objective} vs ref {obj_ref}"
            )

    @pytest.mark.slow
    def test_opf_synthetic(self):
        m = ac_opf_model(30)
        r = madipm(m, tol=1e-8, max_iter=200)
        assert r.status == "first_order"
        # stationarity spot check at the solution: ∇f + Jᵀy − zl + zu ≈ 0
        x = np.asarray(r.x)
        g = np.asarray(m.grad(x))
        jty = np.asarray(m.jtprod(x, r.y))
        res = g + jty - np.asarray(r.zl) + np.asarray(r.zu)
        assert np.abs(res).max() < 1e-5

    def test_maximize(self):
        c = et.ExaCore(minimize=False)
        x = c.add_var(2, start=0.5, lvar=0.0, uvar=1.0)
        c.add_obj(lambda i: x[i] - x[i] ** 2, range(2))
        r = madipm(et.ExaModel(c), tol=1e-10)
        assert r.success
        np.testing.assert_allclose(np.asarray(r.x), [0.5, 0.5], atol=1e-6)
        assert abs(r.objective - 0.5) < 1e-8

    def test_infeasible_detected(self):
        c = et.ExaCore()
        x = c.add_var(1, start=0.0, lvar=0.0, uvar=1.0)
        c.add_obj(lambda i: x[i] ** 2, range(1))
        c.add_con(lambda i: x[i] - 2.0, range(1))  # x = 2 impossible
        r = madipm(et.ExaModel(c), tol=1e-8, max_iter=60)
        assert not r.success
