"""Oracle subsystem tests — the OracleTest analogue
(/root/reference/test/OracleTest/OracleTest.jl): a hand-checkable model
mixing SIMD patterns with oracle blocks; every oracle method differentially
verified against whole-function JAX AD of an equivalent all-SIMD model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import examodels_tpu as et
from examodels_tpu import (
    ExaCore,
    ExaModel,
    OracleEvaluator,
    ScalarNonlinearOracle,
    VectorNonlinearOracle,
    embed_oracle,
    has_matfree_hess,
    has_matfree_jac,
    madipm,
)
from examodels_tpu.core.math import sin


def coo_to_dense(rows, cols, vals, nr, nc, symmetric=False):
    out = np.zeros((nr, nc))
    np.add.at(out, (np.asarray(rows), np.asarray(cols)), np.asarray(vals))
    if symmetric:
        lower = np.tril(out, -1)
        out = out + lower.T
    return out


def mixed_model(oracle_kwargs=None):
    """4 vars: SIMD objective + SIMD constraint + one 2-row oracle block
        c_o1: x0² + x1·x2 − 1 = 0
        c_o2: sin(x3) + x0       = 0 (as inequality −1 ≤ · ≤ 1)
    """
    c = ExaCore()
    x = c.add_var(4, start=0.5, name="x")
    c.add_obj(lambda i: (x[i] - 1.0) ** 2, range(4))
    c.add_con(lambda i: x[i] + x[i + 1] ** 2 - 0.8, range(3),
              lcon=-0.5, ucon=0.5, name="simd")

    def f(xv):
        return jnp.stack([xv[0] ** 2 + xv[1] * xv[2] - 1.0, jnp.sin(xv[3]) + xv[0]])

    kw = dict(
        nvar=4, ncon=2, f=f, lcon=[0.0, -1.0], ucon=[0.0, 1.0], name="orc"
    )
    kw.update(oracle_kwargs or {})
    o = VectorNonlinearOracle(**kw)
    c.add_oracle(o, name="orc")
    return ExaModel(c), o


def equivalent_simd_model():
    c = ExaCore()
    x = c.add_var(4, start=0.5, name="x")
    c.add_obj(lambda i: (x[i] - 1.0) ** 2, range(4))
    c.add_con(lambda i: x[i] + x[i + 1] ** 2 - 0.8, range(3), lcon=-0.5, ucon=0.5)
    c.add_con(x[0] ** 2 + x[1] * x[2] - 1.0)
    c.add_con(sin(x[3]) + x[0], lcon=-1.0, ucon=1.0)
    return ExaModel(c)


def check_equal(m1, m2, x=None, atol=1e-10):
    rng = np.random.default_rng(5)
    x = rng.standard_normal(m1.nvar) * 0.4 + 0.5 if x is None else x
    y = rng.standard_normal(m1.ncon)
    v = rng.standard_normal(m1.nvar)
    np.testing.assert_allclose(float(m1.obj(x)), float(m2.obj(x)), atol=atol)
    np.testing.assert_allclose(np.asarray(m1.cons(x)), np.asarray(m2.cons(x)), atol=atol)
    np.testing.assert_allclose(np.asarray(m1.grad(x)), np.asarray(m2.grad(x)), atol=atol)
    J1 = coo_to_dense(*m1.jac_structure(), m1.jac_coord(x), m1.ncon, m1.nvar)
    J2 = coo_to_dense(*m2.jac_structure(), m2.jac_coord(x), m2.ncon, m2.nvar)
    np.testing.assert_allclose(J1, J2, atol=atol)
    H1 = coo_to_dense(*m1.hess_structure(), m1.hess_coord(x, y), m1.nvar, m1.nvar, True)
    H2 = coo_to_dense(*m2.hess_structure(), m2.hess_coord(x, y), m2.nvar, m2.nvar, True)
    np.testing.assert_allclose(H1, H2, atol=atol)
    np.testing.assert_allclose(
        np.asarray(m1.jprod(x, v)), np.asarray(m2.jprod(x, v)), atol=atol
    )
    np.testing.assert_allclose(
        np.asarray(m1.jtprod(x, y)), np.asarray(m2.jtprod(x, y)), atol=atol
    )
    np.testing.assert_allclose(
        np.asarray(m1.hprod(x, y, v)), np.asarray(m2.hprod(x, y, v)), atol=atol
    )


class TestVectorOracle:
    def test_traceable_auto_ad(self):
        """jit-compatible oracle with auto-dense Jacobian/Hessian."""
        m, o = mixed_model()
        check_equal(m, equivalent_simd_model())
        assert not has_matfree_jac(o)

    def test_explicit_jacobian_hessian(self):
        def jac(xv):
            # rows: [0,0,0, 1,1]; cols: [0,1,2, 3,0]
            return jnp.stack(
                [2 * xv[0], xv[2], xv[1], jnp.cos(xv[3]), jnp.ones(())]
            )

        def hess(xv, yv):
            # lower-tri: (0,0): 2y0 ; (2,1): y0 ; (3,3): −sin(x3) y1
            return jnp.stack(
                [2 * yv[0], yv[0], -jnp.sin(xv[3]) * yv[1]]
            )

        m, o = mixed_model(
            dict(
                jac=jac, jac_rows=[0, 0, 0, 1, 1], jac_cols=[0, 1, 2, 3, 0],
                hess=hess, hess_rows=[0, 2, 3], hess_cols=[0, 1, 3],
            )
        )
        check_equal(m, equivalent_simd_model())

    def test_matrix_free(self):
        def f(xv):
            return jnp.stack([xv[0] ** 2 + xv[1] * xv[2] - 1.0, jnp.sin(xv[3]) + xv[0]])

        def jvp(xv, v):
            return jnp.stack(
                [2 * xv[0] * v[0] + xv[2] * v[1] + xv[1] * v[2],
                 jnp.cos(xv[3]) * v[3] + v[0]]
            )

        def vjp(xv, w):
            return jnp.stack(
                [2 * xv[0] * w[0] + w[1], xv[2] * w[0], xv[1] * w[0],
                 jnp.cos(xv[3]) * w[1]]
            )

        def hvp(xv, w, v):
            return jnp.stack(
                [2 * w[0] * v[0], w[0] * v[2], w[0] * v[1],
                 -jnp.sin(xv[3]) * w[1] * v[3]]
            )

        m, o = mixed_model(dict(jvp=jvp, vjp=vjp, hvp=hvp))
        assert has_matfree_jac(o) and has_matfree_hess(o)
        check_equal(m, equivalent_simd_model())

    @pytest.mark.slow
    def test_host_matrix_free_probe_reconstruction(self):
        """Non-traceable oracle with ONLY matrix-free callbacks: jac_coord/
        hess_coord must be reconstructed from jvp/hvp probes (parity:
        /root/reference/src/oracle.jl:884-910,1104-1129) — not silently
        zero, which made the IPM converge to a wrong point."""

        def f(xv):
            xv = np.asarray(xv)
            return np.array([xv[0] ** 2 + xv[1] * xv[2] - 1.0, np.sin(xv[3]) + xv[0]])

        def jvp(xv, v):
            xv, v = np.asarray(xv), np.asarray(v)
            return np.array([
                2 * xv[0] * v[0] + xv[2] * v[1] + xv[1] * v[2],
                np.cos(xv[3]) * v[3] + v[0],
            ])

        def vjp(xv, w):
            xv, w = np.asarray(xv), np.asarray(w)
            return np.array([
                2 * xv[0] * w[0] + w[1], xv[2] * w[0], xv[1] * w[0],
                np.cos(xv[3]) * w[1],
            ])

        def hvp(xv, w, v):
            xv, w, v = np.asarray(xv), np.asarray(w), np.asarray(v)
            return np.array([
                2 * w[0] * v[0], w[0] * v[2], w[0] * v[1],
                -np.sin(xv[3]) * w[1] * v[3],
            ])

        # auto-dense declared structure
        m, o = mixed_model(
            dict(f=f, jvp=jvp, vjp=vjp, hvp=hvp, jit_compatible=False)
        )
        assert o.nnzj == 8 and o.nnzh == 10  # dense 2x4 + tril(4)
        check_equal(m, equivalent_simd_model())
        r1 = madipm(m, tol=1e-8)
        r2 = madipm(equivalent_simd_model(), tol=1e-8)
        assert r1.success
        np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x), atol=1e-6)

        # declared sparsity without jac/hess callbacks: probe onto it
        m2, o2 = mixed_model(
            dict(
                f=f, jvp=jvp, vjp=vjp, hvp=hvp, jit_compatible=False,
                jac_rows=[0, 0, 0, 1, 1], jac_cols=[0, 1, 2, 3, 0],
                hess_rows=[0, 2, 3], hess_cols=[0, 1, 3],
            )
        )
        assert o2.nnzj == 5 and o2.nnzh == 3
        check_equal(m2, equivalent_simd_model())

    def test_host_matfree_without_hvp_warns(self):
        def f(xv):
            xv = np.asarray(xv)
            return np.array([xv[0] ** 2 + xv[1] * xv[2] - 1.0, np.sin(xv[3]) + xv[0]])

        def jvp(xv, v):
            xv, v = np.asarray(xv), np.asarray(v)
            return np.array([
                2 * xv[0] * v[0] + xv[2] * v[1] + xv[1] * v[2],
                np.cos(xv[3]) * v[3] + v[0],
            ])

        def vjp(xv, w):
            xv, w = np.asarray(xv), np.asarray(w)
            return np.array([
                2 * xv[0] * w[0] + w[1], xv[2] * w[0], xv[1] * w[0],
                np.cos(xv[3]) * w[1],
            ])

        with pytest.warns(UserWarning, match="curvature-free"):
            mixed_model(dict(f=f, jvp=jvp, vjp=vjp, jit_compatible=False))

    def test_host_callback(self):
        """Non-traceable (numpy) callbacks through jax.pure_callback —
        the adapt=Val(true) CPU-bridge analogue."""

        def f(xv):
            xv = np.asarray(xv)
            return np.array([xv[0] ** 2 + xv[1] * xv[2] - 1.0, np.sin(xv[3]) + xv[0]])

        def jac(xv):
            xv = np.asarray(xv)
            return np.array([2 * xv[0], xv[2], xv[1], np.cos(xv[3]), 1.0])

        def hess(xv, yv):
            xv, yv = np.asarray(xv), np.asarray(yv)
            return np.array([2 * yv[0], yv[0], -np.sin(xv[3]) * yv[1]])

        m, o = mixed_model(
            dict(
                f=f, jac=jac, jac_rows=[0, 0, 0, 1, 1], jac_cols=[0, 1, 2, 3, 0],
                hess=hess, hess_rows=[0, 2, 3], hess_cols=[0, 1, 3],
                jit_compatible=False,
            )
        )
        check_equal(m, equivalent_simd_model())

    def test_solve_with_oracle(self):
        m, _ = mixed_model()
        m2 = equivalent_simd_model()
        r1 = madipm(m, tol=1e-8)
        r2 = madipm(m2, tol=1e-8)
        assert r1.success and r2.success
        np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x), atol=1e-6)


class TestScalarOracle:
    def test_obj_grad_hess(self):
        c = ExaCore()
        x = c.add_var(3, start=0.4)
        c.add_obj(lambda i: 0.5 * x[i] ** 2, range(3))
        so = ScalarNonlinearOracle(
            nvar=3, f=lambda xv: jnp.exp(xv[0] * xv[1]) + xv[2] ** 4
        )
        c.add_scalar_oracle(so)
        m = ExaModel(c)

        c2 = ExaCore()
        x2 = c2.add_var(3, start=0.4)
        c2.add_obj(lambda i: 0.5 * x2[i] ** 2, range(3))
        c2.add_obj(et.exp(x2[0] * x2[1]) + x2[2] ** 4)
        m2 = ExaModel(c2)
        check_equal(m, m2)

    def test_solve(self):
        c = ExaCore()
        x = c.add_var(2, start=1.0)
        so = ScalarNonlinearOracle(
            nvar=2, f=lambda xv: (xv[0] - 2.0) ** 2 + (xv[1] + 1.0) ** 2
        )
        c.add_scalar_oracle(so)
        r = madipm(ExaModel(c), tol=1e-10)
        assert r.success
        np.testing.assert_allclose(np.asarray(r.x), [2.0, -1.0], atol=1e-7)


class TestEvaluatorAndEmbed:
    def test_add_eval_accumulates(self):
        """Evaluator contributions accumulate into existing SIMD rows —
        equivalence with the hand-inlined model."""
        c = ExaCore()
        x = c.add_var(4, start=0.6, name="x")
        c.add_obj(lambda i: x[i] ** 2, range(4))
        c.add_con(lambda i: x[i] + x[i + 1], range(3))
        ev = OracleEvaluator(
            var_idx=[1, 3],
            con_rows=[0, 2],
            f=lambda xl: jnp.stack([xl[0] * xl[1], xl[1] ** 3]),
        )
        c.add_eval(ev)
        m = ExaModel(c)

        c2 = ExaCore()
        x2 = c2.add_var(4, start=0.6)
        c2.add_obj(lambda i: x2[i] ** 2, range(4))
        con = c2.add_con(lambda i: x2[i] + x2[i + 1], range(3))
        c2.add_con_aug(con, lambda i: (0, x2[1] * x2[3]), range(1))
        c2.add_con_aug(con, lambda i: (2, x2[3] ** 3), range(1))
        m2 = ExaModel(c2)
        check_equal(m, m2)

    def test_embed_oracle(self):
        """z − f(x) = 0 full-space embedding; z usable in later patterns."""
        c = ExaCore()
        x = c.add_var(2, start=0.8, name="x")
        c.add_obj(lambda i: (x[i] - 1.0) ** 2, range(2))
        z, o = embed_oracle(
            c, lambda xl: jnp.stack([xl[0] * xl[1]]), 1, [x], name="prod"
        )
        c.add_con(z[0] - 0.5)  # x0*x1 = 0.5 through the embedding
        m = ExaModel(c)
        r = madipm(m, tol=1e-9)
        assert r.success
        xs = np.asarray(r.x)
        assert abs(xs[0] * xs[1] - 0.5) < 1e-6
        assert abs(xs[2] - 0.5) < 1e-6  # z at its defining value

    def test_eval_out_of_range(self):
        c = ExaCore()
        x = c.add_var(2)
        c.add_con(lambda i: x[i], range(2))
        with pytest.raises(IndexError):
            c.add_eval(OracleEvaluator(var_idx=[0], con_rows=[5], f=lambda xl: xl))
