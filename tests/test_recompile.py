"""Zero-retrace guarantees — the analogue of the reference's zero-allocation
hot-path tests (/root/reference/test/NLPTest/alloc_test.jl:19-27): after
warmup, oracle calls and parameter updates must not trigger recompilation."""

import jax
import numpy as np

import examodels_tpu as et


def n_compiles(fn):
    return fn._cache_size() if hasattr(fn, "_cache_size") else None


class TestZeroRetrace:
    def test_oracles_compile_once(self):
        c = et.ExaCore()
        x = c.add_var(6, start=0.5)
        th = c.add_par([1.0, 2.0])
        c.add_obj(lambda i: th[0] * (x[i] - th[1]) ** 2 + et.sin(x[i]), range(6))
        c.add_con(lambda i: x[i] * x[i + 1] - 0.2, range(5))
        m = et.ExaModel(c)

        xs = [np.asarray(m.x0) + 0.1 * k for k in range(4)]
        y = np.ones(m.ncon)
        for xv in xs:
            m.obj(xv)
            m.grad(xv)
            m.cons(xv)
            m.jac_coord(xv)
            m.hess_coord(xv, y)
        # parameter update must not retrace either
        et.set_parameter(m, th, [3.0, 0.5])
        for xv in xs:
            m.obj(xv)
            m.hess_coord(xv, y)

        for fn in (m._jit_obj, m._jit_grad, m._jit_cons, m._jit_jac, m._jit_hess):
            sz = n_compiles(fn)
            if sz is not None:
                assert sz == 1, f"{fn} retraced: cache size {sz}"

    def test_dtype_stability(self):
        """float32 inputs must be cast, not trigger a second trace."""
        c = et.ExaCore()
        x = c.add_var(4, start=1.0)
        c.add_obj(lambda i: x[i] ** 2, range(4))
        m = et.ExaModel(c)
        m.obj(np.asarray(m.x0))
        m.obj(np.asarray(m.x0, dtype=np.float32))
        m.obj([float(v) for v in np.asarray(m.x0)])
        sz = n_compiles(m._jit_obj)
        if sz is not None:
            assert sz == 1
