"""Two-stage stochastic AC-OPF (BASELINE config 5): structure tags,
solver-backend equivalence (schur vs dense), and the 512-scenario solve on
the 8-virtual-device CPU mesh (the PoCL-style multi-device simulation of
/root/reference/test/backends.jl:51-65)."""

import jax
import numpy as np
import pytest

import examodels_tpu as et
from examodels_tpu import madipm
from examodels_tpu.models import stochastic_opf_model
from examodels_tpu.parallel import scenario_mesh


class TestStochasticOPF:
    def test_tags_and_dims(self):
        m = stochastic_opf_model(4, nscen=3)
        tags = et.get_var_scen(m)
        # first stage: pg0 only
        assert (tags == 0).sum() == len(
            [v for v in [1]]
        ) * m.core.refs["pg0"].size
        per = (tags == 1).sum()
        assert all((tags == k).sum() == per for k in range(1, 4))
        ctags = et.get_con_scen(m)
        assert (ctags == 0).sum() == 0  # all rows scenario-local
        perc = (ctags == 1).sum()
        assert all((ctags == k).sum() == perc for k in range(1, 4))

    @pytest.mark.slow
    def test_schur_matches_dense(self):
        m = stochastic_opf_model(4, nscen=4)
        rd = madipm(m, tol=1e-8, linear_solver="dense")
        rs = madipm(m, tol=1e-8, linear_solver="schur")
        assert rd.status == "first_order" and rs.status == "first_order"
        assert abs(rd.objective - rs.objective) < 1e-8 * max(
            1, abs(rd.objective)
        )
        np.testing.assert_allclose(
            np.asarray(rd.x), np.asarray(rs.x), atol=1e-6
        )

    @pytest.mark.slow
    def test_ramp_constraint_binds(self):
        """With a tight ramp budget the recourse dispatch must stay within
        Δ of pg0 (the coupling rows are actually enforced)."""
        m = stochastic_opf_model(4, nscen=2, ramp_frac=0.03, load_sigma=0.05)
        r = madipm(m, tol=1e-6, linear_solver="schur")
        assert r.status == "first_order"
        x = np.asarray(r.x)
        pg0 = x[m.core.refs["pg0"].offset:][: m.core.refs["pg0"].size]
        pg = m.core.refs["pg"]
        lv = np.asarray(m.lvar)[m.core.refs["pg0"].offset:][: pg0.size]
        uv = np.asarray(m.uvar)[m.core.refs["pg0"].offset:][: pg0.size]
        ramp = 0.03 * (uv - lv)
        devs = []
        for s in range(2):
            pgs = x[pg.offset + s * pg0.size: pg.offset + (s + 1) * pg0.size]
            dev = np.abs(pgs - pg0)
            assert np.all(dev <= ramp + 1e-6)
            devs.append(dev)
        # at least one scenario's ramp is active (the coupling does work)
        assert np.max(np.concatenate(devs) / ramp) > 0.99

    @pytest.mark.skipif(
        len(jax.devices()) < 8, reason="needs the 8-virtual-device mesh"
    )
    @pytest.mark.slow
    def test_512_scenarios_sharded(self):
        """Config 5 at full scenario count: 512 scenarios sharded over the
        8-device mesh, solved by the scenario-Schur backend to 1e-6."""
        m = stochastic_opf_model(3, nscen=512, load_sigma=0.03)
        mesh = scenario_mesh(devices=jax.devices()[:8])
        r = madipm(
            m, tol=1e-6, linear_solver="schur", mesh=mesh, max_iter=150
        )
        assert r.status == "first_order"
        # spot-check against the unsharded solve
        r1 = madipm(m, tol=1e-6, linear_solver="schur", max_iter=150)
        assert abs(r.objective - r1.objective) < 1e-6 * max(
            1, abs(r1.objective)
        )
