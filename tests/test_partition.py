"""Network-partition sharding of a single NLP (parallel/partition.py) +
the phantom-padded unequal-block generalization of the arrowhead KKT
(solver/schur.py).

This is the "network partitions of AC-OPF" sharding axis: one large model,
no scenario structure, tagged by graph partitioning and solved by the same
scenario-Schur backend the two-stage models use (no reference counterpart —
the reference's only parallelism is per-element GPU threads, SURVEY §2.6).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from examodels_tpu import madipm
from examodels_tpu.models import ac_opf_model, luksan_vlcek_model
from examodels_tpu.models.opf import synthetic_case
from examodels_tpu.parallel import partition_model, partition_tags
from examodels_tpu.solver.kkt import DenseKKT, build_structure
from examodels_tpu.solver.schur import ScenarioSchurKKT


class TestPartitionTags:
    def test_tags_cover_and_validate(self):
        m = ac_opf_model(100)
        var_scen, con_scen = partition_tags(m, 4)
        assert var_scen.shape == (m.nvar,) and con_scen.shape == (m.ncon,)
        assert set(np.unique(var_scen)) <= set(range(5))
        # every part is nonempty at this size
        assert all((var_scen == k).any() for k in range(1, 5))

    def test_no_cross_part_coupling(self):
        # the defining invariant: no Hessian entry and no constraint row
        # couples two different parts (scenario_partition re-validates this
        # and would raise)
        m = ac_opf_model(100)
        partition_model(m, 4)
        s = build_structure(m)
        from examodels_tpu.solver.schur import scenario_partition

        scenario_partition(s, m._var_scen, m._con_scen, 4)  # must not raise

    def test_nparts_one_is_trivial(self):
        m = luksan_vlcek_model(20)
        v, c = partition_tags(m, 1)
        assert (v == 1).all() and (c == 1).all()

    def test_chain_partitions_with_thin_separator(self):
        # Luksan-Vlcek is a chain: x_i couples x_{i-2..i+2}; cuts are O(1)
        m = luksan_vlcek_model(512)
        partition_model(m, 8)
        info = m.partition_info
        assert info["n_separator"] <= 64  # 8 cuts x O(1) columns
        assert info["block_cols_min"] >= 40


class TestPaddedArrowheadKKT:
    """Unequal blocks exercise the phantom-padding path of the generalized
    scenario-Schur solver; compare against DenseKKT on the same system."""

    def _compare(self, model, nparts):
        partition_model(model, nparts)
        s = build_structure(model)
        dense = DenseKKT(s, model.dtype)
        schur = ScenarioSchurKKT(
            s, model._var_scen, model._con_scen, model.nscen, model.dtype
        )
        n = s.nx + s.ns
        x = model.x0 + 0.01
        y = jnp.asarray(
            np.random.default_rng(0).standard_normal(model.ncon) * 0.1,
            model.dtype,
        )
        hvals = model.hess_coord(x, y, obj_weight=1.0)
        jvals = model.jac_coord(x)
        rng = np.random.default_rng(1)
        sigma = jnp.asarray(rng.uniform(0.5, 2.0, n), model.dtype)
        dw = jnp.full(n, 1e-4, model.dtype)
        dc = jnp.asarray(1e-6, model.dtype)
        r1 = jnp.asarray(rng.standard_normal(n), model.dtype)
        r2 = jnp.asarray(rng.standard_normal(s.m), model.dtype)
        dv_d, dy_d, ok_d = dense.solve(hvals, jvals, sigma, dw, dc, r1, r2)
        dv_s, dy_s, ok_s = schur.solve(hvals, jvals, sigma, dw, dc, r1, r2)
        assert bool(ok_d) and bool(ok_s)
        np.testing.assert_allclose(
            np.asarray(dv_s), np.asarray(dv_d), rtol=1e-8, atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(dy_s), np.asarray(dy_d), rtol=1e-8, atol=1e-10
        )

    def test_chain_unequal_blocks(self):
        self._compare(luksan_vlcek_model(200), 4)

    def test_opf_unequal_blocks(self):
        self._compare(ac_opf_model(60), 3)


class TestPartitionedSolve:
    @pytest.mark.slow
    def test_small_opf_partitioned_matches(self):
        m = ac_opf_model(100)
        r_ref = madipm(m, tol=1e-8)
        m2 = ac_opf_model(100)
        partition_model(m2, 4)
        r = madipm(m2, tol=1e-8, linear_solver="schur")
        assert r.success
        np.testing.assert_allclose(r.objective, r_ref.objective, rtol=1e-9)

    @pytest.mark.slow
    def test_1kbus_opf_partitioned_8dev_mesh(self):
        # The round-4 "Done" criterion: madipm on a SINGLE >=1k-bus AC-OPF
        # over the 8-device virtual mesh matches the single-device
        # objective to 1e-6. Near-planar topology (chord_span=8): thin
        # cuts, separator ~285 of 8800 columns.
        from jax.sharding import Mesh

        assert len(jax.devices()) >= 8
        case = synthetic_case(1000, chord_span=8)
        m = ac_opf_model(case)
        r_ref = madipm(m, tol=1e-8, linear_solver="blocktri")
        assert r_ref.success

        m2 = ac_opf_model(case)
        partition_model(m2, 8)
        assert m2.partition_info["n_separator"] < 600
        mesh = Mesh(np.array(jax.devices()[:8]), ("scen",))
        r = madipm(m2, tol=1e-8, linear_solver="schur", mesh=mesh)
        assert r.success
        assert (
            abs(r.objective - r_ref.objective)
            <= 1e-6 * abs(r_ref.objective)
        )


class TestDeviceLoopSchur:
    @pytest.mark.slow
    def test_partitioned_model_through_device_loop(self):
        # the single-dispatch device IPM accepts the schur backend too, so
        # partitioned/two-stage models get the zero-host-sync loop
        from examodels_tpu.solver.ipm_device import madipm_device

        m = ac_opf_model(100)
        partition_model(m, 4)
        r = madipm_device(m, tol=1e-6, linear_solver="schur", max_iter=100)
        m1 = ac_opf_model(100)
        r1 = madipm(m1, tol=1e-6)
        assert r.success
        assert abs(r.objective - r1.objective) <= 1e-5 * abs(r1.objective)

    def test_schur_rejects_low_precision_factor(self):
        from examodels_tpu.solver.ipm_device import madipm_device

        m = ac_opf_model(60)
        partition_model(m, 2)
        with pytest.raises(ValueError, match="working dtype"):
            madipm_device(m, linear_solver="schur", factor_dtype="float32")
