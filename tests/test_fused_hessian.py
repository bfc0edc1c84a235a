"""Fused single-pass Hessian (edge pushing) vs the dense jacfwd(grad) path.

The fused path (compile.make_hess_entry_fn) is the default; the dense
p*p forward-over-reverse evaluation is kept as a fallback. These tests
compare the two on trees chosen to stress every recursion branch:
repeated slots, same-variable cross terms, integer/real powers, NarySum
under a nonlinear op, purely linear patterns (must emit zero entries),
and data-coincident indices (runtime diagonal doubling).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from examodels_tpu.core.compile import trace_pattern
from examodels_tpu.core import math as em
from examodels_tpu.nlp.core import ExaCore
from examodels_tpu.nlp.model import ExaModel


def _dense_entries(pat, k, v, d, th):
    hfull = jax.jacfwd(jax.grad(pat.eval_fn, argnums=0), argnums=0)(v, d, th)
    return np.asarray(hfull)[pat.hpairs[:, 0], pat.hpairs[:, 1]]


def _check_pattern(template, data, *, x=None, th=None, atol=1e-10):
    """Trace, then compare fused vs dense per-element entries."""
    pat = trace_pattern(template, data)
    rng = np.random.default_rng(0)
    nx = int(pat.vidx.max()) + 1 if pat.p else 1
    nth = int(pat.pidx.max()) + 1 if pat.q else 1
    x = rng.uniform(0.5, 1.5, nx) if x is None else np.asarray(x)
    th = rng.uniform(0.5, 1.5, nth) if th is None else np.asarray(th)
    for k in range(pat.n):
        v = jnp.asarray(x[pat.vidx[k]])
        d = tuple(jnp.asarray(c[k]) for c in pat.data_cols)
        tg = jnp.asarray(th[pat.pidx[k]])
        fused = np.asarray(pat.hess_entry_fn(v, d, tg))
        dense = _dense_entries(pat, k, v, d, tg)
        np.testing.assert_allclose(fused, dense, atol=atol, rtol=1e-9,
                                   err_msg=f"element {k}")
    return pat


class _X:
    """Fake variable handle indexable by data fields (returns VarNode)."""

    def __init__(self, core, n, name):
        self.var = core.add_var(n, name=name)

    def __getitem__(self, i):
        return self.var[i]


def test_same_variable_product():
    # x[i]*x[i]: cross term with identical slot -> doubled into (s, s)
    c = ExaCore()
    x = c.add_var(4)
    _check_pattern(lambda i: x[i] * x[i], range(4))


def test_repeated_slot_in_nonlinear():
    c = ExaCore()
    x = c.add_var(4)
    _check_pattern(lambda i: em.exp(x[i]) * em.sin(x[i]) + x[i] ** 3, range(4))


def test_two_vars_cross():
    c = ExaCore()
    x = c.add_var(6)
    _check_pattern(
        lambda i: em.exp(x[i] * x[i + 1]) / (1.0 + x[i] ** 2), range(5)
    )


def test_integer_pow_chain():
    c = ExaCore()
    x = c.add_var(5)
    _check_pattern(
        lambda i: (x[i] ** 2 - x[i + 1]) ** 2 + (x[i] - 1.0) ** 2, range(4)
    )


def test_negative_base_integer_pow():
    # integer_pow must stay exact for negative bases in both paths
    c = ExaCore()
    x = c.add_var(3)
    _check_pattern(lambda i: x[i] ** 3 + x[i] ** (-2), range(3),
                   x=np.array([-1.3, -0.7, -2.1]))


def test_real_pow():
    c = ExaCore()
    x = c.add_var(3)
    _check_pattern(lambda i: x[i] ** 1.7, range(3))


def test_purely_linear_emits_nothing():
    c = ExaCore()
    x = c.add_var(4)
    pat = trace_pattern(lambda i: 3.0 * x[i] - 2.0 * x[i + 1] + 5.0, range(3))
    assert pat.o2step == 0
    v = jnp.asarray(np.ones(2))
    out = pat.hess_entry_fn(v, (jnp.asarray(0),), jnp.zeros(0))
    assert out.shape == (0,)


def test_linear_wrapper_of_nonlinear():
    # hrpass0 pruning: +/- wrappers contribute no pairs of their own
    c = ExaCore()
    x = c.add_var(4)
    _check_pattern(
        lambda i: x[i] - x[i + 1] + em.log(x[i]) - 0.5 * x[i + 1], range(3)
    )


def test_nary_sum_under_nonlinear():
    c = ExaCore()
    x = c.add_var(6)
    _check_pattern(
        lambda i: em.exp(em.esum(x[i + j] for j in range(3))), range(3)
    )


def test_nary_sum_linear_context():
    c = ExaCore()
    x = c.add_var(6)
    _check_pattern(
        lambda i: em.esum(x[i + j] ** 2 for j in range(3)), range(3)
    )


def test_division_and_trig():
    c = ExaCore()
    x = c.add_var(4)
    _check_pattern(
        lambda i: em.sin(x[i] - x[i + 1]) * em.sin(x[i] + x[i + 1])
        + x[i] / x[i + 1],
        range(3),
    )


def test_parameters_and_data():
    c = ExaCore()
    x = c.add_var(5)
    p = c.add_par(np.linspace(0.5, 1.0, 5))
    _check_pattern(
        lambda i: p[i] * em.exp(x[i] * x[i + 1]) + x[i] * p[i + 1] * 2.0,
        range(4),
    )


def test_atan2_hypot_logaddexp():
    c = ExaCore()
    x = c.add_var(4)
    _check_pattern(
        lambda i: em.atan2(x[i], x[i + 1])
        + em.hypot(x[i], x[i + 1])
        + em.logaddexp(x[i], x[i + 1]),
        range(3),
    )


def test_runtime_coincident_indices_doubling():
    # two structurally distinct slots resolving to the SAME variable at
    # runtime: the stored lower-triangle entry must be doubled (hdup) —
    # cross-check the whole model-level Hessian against jax dense AD
    c = ExaCore()
    x = c.add_var(3)
    iv = np.array([0, 1, 2])
    jv = np.array([1, 1, 0])  # element 1 has i == j -> coincident
    data = [(int(a), int(b)) for a, b in zip(iv, jv)]
    c.add_obj(lambda e: em.exp(x[e[0]]) * em.sin(x[e[1]]), data)
    m = ExaModel(c)
    x0 = np.array([0.3, -0.2, 0.8])

    def f(xx):
        tot = 0.0
        for a, b in data:
            tot += jnp.exp(xx[a]) * jnp.sin(xx[b])
        return tot

    hd = np.asarray(jax.hessian(f)(jnp.asarray(x0)))
    rows, cols = m.hess_structure()
    vals = np.asarray(m.hess_coord(x0))
    acc = np.zeros((3, 3))
    for r, cc, v in zip(rows, cols, vals):
        acc[r, cc] += v
    full = np.tril(acc) + np.tril(acc, -1).T
    np.testing.assert_allclose(full, hd, atol=1e-10)


def test_model_level_fused_equals_jacfwd_env(monkeypatch):
    # build the same model through both _HESS_MODE paths and compare
    import examodels_tpu.nlp.model as mod

    def build():
        c = ExaCore()
        x = c.add_var(8)
        c.add_obj(
            lambda i: 100.0 * (x[i - 1] ** 2 - x[i]) ** 2 + (x[i - 1] - 1) ** 2,
            range(1, 8),
        )
        c.add_con(
            lambda i: 3 * x[i + 1] ** 3 + 2 * x[i + 2]
            - 5
            + em.sin(x[i + 1] - x[i + 2]) * em.sin(x[i + 1] + x[i + 2])
            + 4 * x[i + 1]
            - x[i] * em.exp(x[i] - x[i + 1])
            - 3,
            range(6),
        )
        return ExaModel(c)

    m_fused = build()
    monkeypatch.setattr(mod, "_HESS_MODE", "jacfwd")
    m_dense = build()
    monkeypatch.setattr(mod, "_HESS_MODE", "fused")

    rng = np.random.default_rng(1)
    x0 = rng.uniform(0.5, 1.5, 8)
    y0 = rng.standard_normal(m_fused.ncon)
    hf = np.asarray(m_fused.hess_coord(x0, y0, obj_weight=0.7))
    hdn = np.asarray(m_dense.hess_coord(x0, y0, obj_weight=0.7))
    np.testing.assert_allclose(hf, hdn, atol=1e-11)


def test_structural_sync_guard():
    # every emitted pair must be inside the enumerated layout for a wide op mix
    c = ExaCore()
    x = c.add_var(10)
    pat = _check_pattern(
        lambda i: em.tanh(x[i]) * em.log(x[i + 1] + 2.0)
        + em.sqrt(x[i + 2] + 3.0) / (x[i] + 2.0),
        range(8),
    )
    assert pat.o2step >= 1
