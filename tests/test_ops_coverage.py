"""Per-operator derivative coverage — ADTest parity
(/root/reference/test/ADTest/ADTest.jl:6-121,299-376): every registered
univariate/bivariate operator is traced through the pattern pipeline and its
gradient/Hessian checked against central finite differences at safe points."""

import numpy as np
import pytest

import examodels_tpu as et
from examodels_tpu import ExaCore, ExaModel
from examodels_tpu.core import math as em
from examodels_tpu.core.graph import BIVARIATE_OPS, UNIVARIATE_OPS

# safe evaluation point per op (domain constraints); default 0.43
_UNARY_POINT = {
    "acosh": 1.7, "asech": 0.6, "acoth": 1.9, "acsch": 0.8,
    "atanh": 0.43, "asin": 0.43, "acos": 0.43, "acsc": 1.8, "asec": 1.9,
    "log": 0.9, "log2": 0.9, "log10": 0.9, "log1p": 0.43, "sqrt": 0.8,
    "cbrt": 0.8, "inv": 0.7, "logit": 0.3, "erfinv": 0.4,
    "gamma": 1.3, "gammaln": 1.3, "loggamma": 1.3, "digamma": 1.4,
    "besseli0": 0.6, "besseli1": 0.6, "i0e": 0.6, "i1e": 0.6,
    "csch": 0.7, "coth": 0.7,
}
_SKIP_NONSMOOTH = {"abs", "sign", "floor", "ceil", "round"}
_BIN_POINT = {
    "pow": (1.3, 1.7), "log": (1.3, 1.7), "beta": (1.2, 1.5),
    "logbeta": (1.2, 1.5), "div": (0.8, 1.3), "atan2": (0.7, 1.1),
    "hypot": (0.7, 1.1), "logaddexp": (0.4, 0.9),
}
_BIN_SKIP = {"max", "min", "mod", "floordiv"}  # piecewise / nonsmooth


def fd_grad(f, x, h=1e-6):
    g = np.zeros_like(x)
    for k in range(len(x)):
        e = np.zeros_like(x)
        e[k] = h
        g[k] = (f(x + e) - f(x - e)) / (2 * h)
    return g


def fd_hess(f, x, h=1e-4):
    n = len(x)
    H = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            ei = np.zeros(n); ei[i] = h
            ej = np.zeros(n); ej[j] = h
            H[i, j] = (
                f(x + ei + ej) - f(x + ei - ej) - f(x - ei + ej) + f(x - ei - ej)
            ) / (4 * h * h)
    return (H + H.T) / 2


def coo_dense_hess(m, x):
    hr, hc = m.hess_structure()
    hv = np.asarray(m.hess_coord(x))
    H = np.zeros((m.nvar, m.nvar))
    np.add.at(H, (np.asarray(hr), np.asarray(hc)), hv)
    low = np.tril(H, -1)
    return H + low.T


@pytest.mark.parametrize("op", sorted(UNIVARIATE_OPS))
def test_univariate(op):
    if op in _SKIP_NONSMOOTH or op == "neg":
        pytest.skip("piecewise-linear / trivial")
    x0 = _UNARY_POINT.get(op, 0.43)
    fn = getattr(em, op)

    c = ExaCore()
    x = c.add_var(1, start=x0)
    c.add_obj(lambda i: fn(x[i]) + 0.0 * x[i], range(1))
    m = ExaModel(c)
    xv = np.array([x0])

    def f(v):
        return float(m.obj(v))

    g = np.asarray(m.grad(xv))
    gf = fd_grad(f, xv)
    np.testing.assert_allclose(g, gf, rtol=2e-5, atol=2e-6)
    H = coo_dense_hess(m, xv)
    Hf = fd_hess(f, xv)
    np.testing.assert_allclose(H, Hf, rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("op", sorted(BIVARIATE_OPS))
def test_bivariate(op):
    if op in _BIN_SKIP:
        pytest.skip("piecewise")
    a0, b0 = _BIN_POINT.get(op, (0.6, 1.1))
    spec = BIVARIATE_OPS[op]

    c = ExaCore()
    x = c.add_var(2, start=[a0, b0])
    c.add_obj(
        lambda i: et.Const(1.0) * spec.fn(x[0], x[1])
        if False
        else _apply(op, x[0], x[1]),
        range(1),
    )
    m = ExaModel(c)
    xv = np.array([a0, b0])

    def f(v):
        return float(m.obj(v))

    g = np.asarray(m.grad(xv))
    gf = fd_grad(f, xv)
    np.testing.assert_allclose(g, gf, rtol=2e-5, atol=2e-6)
    H = coo_dense_hess(m, xv)
    Hf = fd_hess(f, xv)
    np.testing.assert_allclose(H, Hf, rtol=2e-3, atol=2e-4)


def _apply(op, a, b):
    from examodels_tpu.core.graph import make_binary

    return make_binary(op, a, b)


class TestRegistration:
    def test_custom_univariate(self):
        """User-registered operator flows through grad/hess
        (parity: @register_univariate, /root/reference/src/register.jl)."""
        import jax.numpy as jnp

        softplus2 = et.register_univariate("softplus2", lambda t: jnp.logaddexp(0.0, 2.0 * t))
        c = ExaCore()
        x = c.add_var(1, start=0.3)
        c.add_obj(lambda i: softplus2(x[i]), range(1))
        m = ExaModel(c)
        xv = np.array([0.3])
        gf = fd_grad(lambda v: float(m.obj(v)), xv)
        np.testing.assert_allclose(np.asarray(m.grad(xv)), gf, rtol=1e-5)

    def test_custom_bivariate(self):
        import jax.numpy as jnp

        gm = et.register_bivariate("geomean2", lambda a, b: jnp.sqrt(a * b))
        c = ExaCore()
        x = c.add_var(2, start=[1.2, 2.3])
        c.add_obj(lambda i: gm(x[0], x[1]), range(1))
        m = ExaModel(c)
        xv = np.array([1.2, 2.3])
        gf = fd_grad(lambda v: float(m.obj(v)), xv)
        np.testing.assert_allclose(np.asarray(m.grad(xv)), gf, rtol=1e-5)
        Hf = fd_hess(lambda v: float(m.obj(v)), xv)
        np.testing.assert_allclose(coo_dense_hess(m, xv), Hf, rtol=1e-3, atol=1e-5)
