"""Handle-sliced getters/setters (parity: GetterSetterTest of the reference,
get_value/set_value!/get_/set_ start|lvar|uvar|lcon|ucon,
/root/reference/src/nlp.jl:803-931)."""

import numpy as np
import pytest

import examodels_tpu as et
from examodels_tpu.core import math as em


def _build():
    c = et.ExaCore()
    x = c.add_var((2, 3), start=1.5, lvar=-1.0, uvar=4.0)
    z = c.add_var(4, start=0.0)
    p = c.add_par(np.arange(4.0))
    con = c.add_con(
        lambda i: x[0, i] * z[i] + em.exp(z[i]) - p[i],
        range(3),
        lcon=-2.0,
        ucon=2.0,
    )
    m = et.ExaModel(c)
    return m, x, z, p, con


def test_get_shapes_and_values():
    m, x, z, p, con = _build()
    assert et.get_start(m, x).shape == (2, 3)
    np.testing.assert_allclose(np.asarray(et.get_start(m, x)), 1.5)
    np.testing.assert_allclose(np.asarray(et.get_lvar(m, x)), -1.0)
    np.testing.assert_allclose(np.asarray(et.get_uvar(m, x)), 4.0)
    np.testing.assert_allclose(np.asarray(et.get_value(m, p)), np.arange(4.0))
    np.testing.assert_allclose(np.asarray(et.get_lcon(m, con)), -2.0)
    np.testing.assert_allclose(np.asarray(et.get_ucon(m, con)), 2.0)
    assert np.asarray(et.get_start(m, con)).shape == (3,)


def test_set_roundtrip():
    m, x, z, p, con = _build()
    vals = np.arange(6.0).reshape(2, 3)
    et.set_start(m, x, vals)
    np.testing.assert_allclose(np.asarray(et.get_start(m, x)), vals)
    # the other variable block is untouched
    np.testing.assert_allclose(np.asarray(et.get_start(m, z)), 0.0)

    et.set_lvar(m, x, vals - 10)
    et.set_uvar(m, x, vals + 10)
    np.testing.assert_allclose(np.asarray(et.get_lvar(m, x)), vals - 10)
    np.testing.assert_allclose(np.asarray(et.get_uvar(m, x)), vals + 10)

    et.set_lcon(m, con, [-5.0, -6.0, -7.0])
    et.set_ucon(m, con, [5.0, 6.0, 7.0])
    np.testing.assert_allclose(np.asarray(et.get_lcon(m, con)), [-5, -6, -7])
    np.testing.assert_allclose(np.asarray(et.get_ucon(m, con)), [5, 6, 7])

    et.set_start(m, con, [0.1, 0.2, 0.3])
    np.testing.assert_allclose(np.asarray(et.get_start(m, con)), [0.1, 0.2, 0.3])


def test_set_value_affects_eval_without_retrace():
    m, x, z, p, con = _build()
    x0 = np.asarray(m.x0)
    c0 = np.asarray(m.cons(x0))
    et.set_value(m, p, np.arange(4.0) + 1.0)
    np.testing.assert_allclose(np.asarray(et.get_value(m, p)), np.arange(4.0) + 1.0)
    c1 = np.asarray(m.cons(x0, theta=m.theta))
    np.testing.assert_allclose(c1, c0 - 1.0, atol=1e-12)


def test_size_mismatch_raises():
    m, x, z, p, con = _build()
    with pytest.raises(ValueError):
        et.set_start(m, x, np.zeros(5))
    with pytest.raises(ValueError):
        et.set_lcon(m, con, np.zeros(2))
    with pytest.raises(ValueError):
        et.set_value(m, p, np.zeros(3))
