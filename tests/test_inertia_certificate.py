"""Inertia handling: SPD of the condensed matrix certifies correct inertia
of the regularized augmented system, so certifying backends skip the
conservative curvature test (which spuriously regularizes near solutions of
equality-constrained problems). Non-certifying backends (CG, and the
mixed-precision blocktri factor — an f32 Cholesky can succeed on a matrix
with a negative eigenvalue below f32 roundoff, and IR/PCG residual
convergence says nothing about definiteness) keep the curvature test."""

import numpy as np
import jax.numpy as jnp

from examodels_tpu import ExaCore, ExaModel, madipm
from examodels_tpu.models import luksan_vlcek_model
from examodels_tpu.solver.kkt import CGKKT, DenseKKT, build_structure


def test_certificate_flags():
    m = luksan_vlcek_model(10)
    s = build_structure(m)
    assert DenseKKT.certifies_inertia is True
    assert CGKKT.certifies_inertia is False
    from examodels_tpu.solver.blocktri import BlockTriKKT

    k64 = BlockTriKKT(s)
    assert k64.certifies_inertia is True
    k32 = BlockTriKKT(s, factor_dtype=jnp.float32)
    # f32 factor success is NOT an inertia certificate in f64 arithmetic:
    # the IPM's curvature safeguard must stay active for this backend
    assert k32.certifies_inertia is False


def test_indefinite_lagrangian_converges():
    """min -x1*x2 s.t. x1 + x2 = 2: W indefinite everywhere but the reduced
    Hessian is PD — a certified backend must converge without stalling."""
    c = ExaCore()
    x = c.add_var(2, start=np.array([0.5, 0.1]))
    c.add_obj(lambda i: -x[0] * x[1], range(1))
    c.add_con(lambda i: x[0] + x[1] - 2.0, range(1))
    m = ExaModel(c)
    r = madipm(m, tol=1e-8, linear_solver="dense")
    assert r.success
    np.testing.assert_allclose(np.asarray(r.x), [1.0, 1.0], atol=1e-6)


def test_mixed_precision_blocktri_solves():
    m = luksan_vlcek_model(300)
    r = madipm(m, tol=1e-6, linear_solver="blocktri", factor_dtype="float32")
    r64 = madipm(m, tol=1e-6, linear_solver="blocktri")
    assert r.success and r64.success
    np.testing.assert_allclose(
        np.asarray(r.x), np.asarray(r64.x), atol=1e-5
    )


def test_cg_backend_solves():
    m = luksan_vlcek_model(80)
    r = madipm(m, tol=1e-6, linear_solver="cg")
    r64 = madipm(m, tol=1e-6, linear_solver="dense")
    assert r.success
    np.testing.assert_allclose(np.asarray(r.x), np.asarray(r64.x), atol=1e-4)
