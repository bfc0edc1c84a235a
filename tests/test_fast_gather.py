"""Fast-gather correctness: the slot classifier and the 2-step/slice gather
must reproduce the plain gather bit-for-bit on every oracle (the coordinate
paths use _gather_fast; jvp/vjp paths use the plain gather — both run here
and are cross-checked)."""

import numpy as np
import pytest

from examodels_tpu import ExaCore, ExaModel
from examodels_tpu.core.math import sin
from examodels_tpu.nlp.model import _slot_plan


class TestSlotPlan:
    def test_contiguous(self):
        assert _slot_plan(np.arange(5, 50)) == ("slice", 5)

    def test_constant(self):
        assert _slot_plan(np.full(9, 7)) == ("const", 7)

    def test_singleton(self):
        assert _slot_plan(np.array([3])) == ("const", 3)

    def test_strided(self):
        assert _slot_plan(np.arange(2, 62, 3)) == ("strided", 2, 3)

    def test_generic(self):
        assert _slot_plan(np.array([0, 5, 2, 9])) == ("gather",)

    def test_negative_stride_is_generic(self):
        assert _slot_plan(np.arange(50, 5, -1)) == ("gather",)


@pytest.fixture(scope="module")
def mixed_model():
    """A model exercising every slot-plan kind: contiguous (x[i]), strided
    (x[2*i]), constant (x[0]), and data-dependent gather (x[d.j])."""
    rng = np.random.default_rng(5)
    n = 40
    c = ExaCore()
    x = c.add_var(2 * n, start=rng.standard_normal(2 * n))
    jcol = rng.integers(0, 2 * n, n)
    data = dict(i=np.arange(n), j=jcol, w=rng.standard_normal(n))
    c.add_obj(
        lambda d: d.w * (x[d.i] - x[d.j]) ** 2 + sin(x[2 * d.i]) * x[0],
        data,
    )
    con = c.add_con(
        lambda d: x[d.i] * x[d.j] + x[2 * d.i] ** 3 - d.w,
        data,
        lcon=-1.0,
        ucon=1.0,
    )
    c.add_con_aug(con, lambda d: (d.i, x[d.j] ** 2), data)
    return ExaModel(c), rng


def test_plans_cover_all_kinds(mixed_model):
    model, _ = mixed_model
    kinds = {pl[0] for rt in model._obj_pats + model._con_pats for pl in rt.vplan}
    assert {"slice", "strided", "gather"} <= kinds


def test_fast_matches_plain_gather(mixed_model):
    """Coordinate oracles (fast gather) vs jvp/vjp-reconstructed quantities
    (plain gather) must agree to machine precision."""
    model, rng = mixed_model
    x = np.asarray(model.x0) + 0.1 * rng.standard_normal(model.nvar)
    y = rng.standard_normal(model.ncon)

    # jacobian coordinates (fast) vs jprod against basis vectors (plain)
    jr, jc = model.jac_structure()
    jv = np.asarray(model.jac_coord(x))
    J = np.zeros((model.ncon, model.nvar))
    np.add.at(J, (np.asarray(jr), np.asarray(jc)), jv)
    for k in rng.integers(0, model.nvar, 5):
        e = np.zeros(model.nvar)
        e[k] = 1.0
        np.testing.assert_allclose(
            np.asarray(model.jprod(x, e)), J @ e, atol=1e-12
        )

    # gradient (fast) vs finite differences of obj (fast but scalar path)
    g = np.asarray(model.grad(x))
    h = 1e-6
    for k in rng.integers(0, model.nvar, 5):
        e = np.zeros(model.nvar)
        e[k] = h
        fd = (float(model.obj(x + e)) - float(model.obj(x - e))) / (2 * h)
        np.testing.assert_allclose(g[k], fd, rtol=1e-5, atol=1e-7)

    # hessian coordinates (fast) vs hprod (plain)
    hr, hc = model.hess_structure()
    hv = np.asarray(model.hess_coord(x, y))
    H = np.zeros((model.nvar, model.nvar))
    np.add.at(H, (np.asarray(hr), np.asarray(hc)), hv)
    H = H + H.T - np.diag(np.diag(H))
    for k in rng.integers(0, model.nvar, 5):
        e = np.zeros(model.nvar)
        e[k] = 1.0
        np.testing.assert_allclose(
            np.asarray(model.hprod(x, y, e)), H @ e, atol=1e-10
        )

    # cons (fast) vs jtprod identity on sums (plain):
    # d/dx [y . cons(x)] = jtprod(x, y)
    cons0 = np.asarray(model.cons(x))
    jt = np.asarray(model.jtprod(x, y))
    np.testing.assert_allclose(jt, J.T @ y, atol=1e-12)
    assert np.isfinite(cons0).all()


def test_nvar_not_multiple_of_128(mixed_model):
    """Padding path: nvar=80 pads to 128; results already checked above but
    assert the pad bookkeeping explicitly."""
    model, _ = mixed_model
    assert model.nvar == 80
    assert model._x_pad == 48


class TestPallasGatherPlan:
    """ops/gather.py — the TPU on-chip routing kernel, run here through the
    Pallas interpreter (CPU). The f64 two-plane split is exact at the TPU's
    f32x2 device precision (~2^-48); on CPU (true f64) the comparison gets
    that tolerance."""

    def _plan(self, idx, nvar):
        from examodels_tpu.ops.gather import build_gather_plan

        return build_gather_plan(idx, nvar)

    def test_random_f32_exact(self):
        import jax.numpy as jnp

        from examodels_tpu.ops.gather import gather_apply

        rng = np.random.default_rng(0)
        nvar, n = 300, 5000
        idx = rng.integers(0, nvar, n)
        plan = self._plan(idx, nvar)
        x = jnp.asarray(rng.standard_normal(nvar), jnp.float32)
        out = np.asarray(
            gather_apply(plan, plan.arrays, x, interpret=True)
        )
        np.testing.assert_array_equal(out, np.asarray(x)[idx])

    def test_random_f64_split_precision(self):
        import jax.numpy as jnp

        from examodels_tpu.ops.gather import gather_apply

        rng = np.random.default_rng(1)
        nvar, n = 1000, 40000
        idx = rng.integers(0, nvar, n)
        plan = self._plan(idx, nvar)
        xv = rng.standard_normal(nvar) * 100
        x = jnp.asarray(xv, jnp.float64)
        out = np.asarray(
            gather_apply(plan, plan.arrays, x, interpret=True)
        )
        np.testing.assert_allclose(out, xv[idx], rtol=2e-14)

    def test_clustered_indices(self):
        """Heavy duplication/locality (the real OPF profile): many items per
        (row, lane) group exercises multi-rank jobs."""
        import jax.numpy as jnp

        from examodels_tpu.ops.gather import gather_apply

        rng = np.random.default_rng(2)
        nvar = 400
        idx = np.concatenate([
            np.full(700, 3), rng.integers(0, 5, 2000),
            rng.integers(0, nvar, 3000),
        ])
        plan = self._plan(idx, nvar)
        x = jnp.asarray(rng.standard_normal(nvar), jnp.float32)
        out = np.asarray(
            gather_apply(plan, plan.arrays, x, interpret=True)
        )
        np.testing.assert_array_equal(out, np.asarray(x)[idx])

    def test_bounds_check(self):
        from examodels_tpu.ops.gather import build_gather_plan

        with pytest.raises(ValueError):
            build_gather_plan(np.array([0, 5, 100]), 100)

    def test_model_pallas_path_matches_xla(self, monkeypatch):
        """Force the model's Pallas gather path (interpreted) and compare
        every oracle against the XLA 2-step path."""
        from functools import lru_cache

        import examodels_tpu.ops.gather as G

        orig = G._chunk_call.__wrapped__

        @lru_cache(maxsize=None)
        def interp(nblk, np_, interpret=False):
            return orig(nblk, np_, True)

        monkeypatch.setattr(G, "_chunk_call", interp)
        monkeypatch.setenv("EXAMODELS_TPU_GATHER", "pallas")
        from examodels_tpu.models import ac_opf_model

        m = ac_opf_model(30)
        assert m._gplan is not None
        monkeypatch.setenv("EXAMODELS_TPU_GATHER", "xla")
        m2 = ac_opf_model(30)
        assert m2._gplan is None
        rng = np.random.default_rng(3)
        x = np.asarray(m.x0) + 0.01 * rng.standard_normal(m.nvar)
        y = rng.standard_normal(m.ncon)
        for name in ("obj", "cons", "grad", "jac_coord"):
            a = np.asarray(getattr(m, name)(x))
            b = np.asarray(getattr(m2, name)(x))
            scale = max(1.0, np.abs(b).max())
            assert np.abs(a - b).max() < 1e-13 * scale, name
        h1 = np.asarray(m.hess_coord(x, y))
        h2 = np.asarray(m2.hess_coord(x, y))
        assert np.abs(h1 - h2).max() < 1e-13 * max(1.0, np.abs(h2).max())


def test_f64_two_plane_probe_rejects_true_f64_backend():
    # On CPU f64 carries a full 53-bit significand, so the two-plane f32
    # transport is lossy and the probe must say so (forcing the 'auto'
    # kernel selection back to the XLA gather). On an f32x2-emulating TPU
    # stack the same probe returns True and enables the Pallas kernel.
    import jax

    from examodels_tpu.ops.gather import f64_two_plane_exact

    assert jax.default_backend() == "cpu"
    assert f64_two_plane_exact() is False
