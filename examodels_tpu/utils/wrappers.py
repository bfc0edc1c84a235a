"""Interoperability wrappers — capability parity with the reference's L7
(/root/reference/src/utils.jl): TimedNLPModel (per-callback profiling),
CompressedNLPModel (duplicate-NNZ merging), WrapperNLPModel (host-array
bridging for CPU consumers of a device model)."""

from __future__ import annotations

import time
from collections import defaultdict
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["TimedModel", "CompressedModel", "WrapperModel", "CallbackStats"]


@dataclass
class CallbackStats:
    """Wall time + call count per NLP callback
    (parity: /root/reference/src/utils.jl:269-313)."""

    time: dict = field(default_factory=lambda: defaultdict(float))
    calls: dict = field(default_factory=lambda: defaultdict(int))

    def record(self, name: str, dt: float):
        self.time[name] += dt
        self.calls[name] += 1

    def table(self) -> str:
        rows = ["  callback        calls      total (s)    per-call (ms)"]
        total = 0.0
        for name in sorted(self.time):
            t, c = self.time[name], self.calls[name]
            total += t
            rows.append(
                f"  {name:<14s} {c:>6d}   {t:>12.6f}   {1e3 * t / max(c, 1):>12.4f}"
            )
        rows.append(f"  {'TOTAL':<14s} {'':>6s}   {total:>12.6f}")
        return "\n".join(rows)


_ORACLE_METHODS = (
    "obj", "grad", "cons", "jac_coord", "hess_coord", "jprod", "jtprod", "hprod",
)
_PASSTHROUGH = (
    "nvar", "ncon", "npar", "nnzj", "nnzh", "x0", "y0", "lvar", "uvar",
    "lcon", "ucon", "theta", "dtype", "minimize", "core",
)


class _Forwarding:
    """Base: forwards meta/structure to the inner model."""

    def __init__(self, inner):
        self.inner = inner

    def __getattr__(self, name):
        if name in _PASSTHROUGH:
            return getattr(self.inner, name)
        raise AttributeError(name)

    def jac_structure(self):
        return self.inner.jac_structure()

    def hess_structure(self):
        return self.inner.hess_structure()


class TimedModel(_Forwarding):
    """Per-callback wall-time profiling wrapper (parity: TimedNLPModel,
    /root/reference/src/utils.jl:269-408). Blocks on device results so the
    recorded time is true compute time, not dispatch time."""

    def __init__(self, inner):
        super().__init__(inner)
        self.stats = CallbackStats()

    def _timed(self, name, fn, *args, **kw):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        self.stats.record(name, time.perf_counter() - t0)
        return out

    def __repr__(self):
        return f"TimedModel of {self.inner!r}\n{self.stats.table()}"


for _name in _ORACLE_METHODS:
    def _make(nm):
        def method(self, *args, **kw):
            return self._timed(nm, getattr(self.inner, nm), *args, **kw)

        method.__name__ = nm
        return method

    setattr(TimedModel, _name, _make(_name))


class CompressedModel(_Forwarding):
    """Merges duplicate (row, col) COO coordinates into unique entries
    (parity: CompressedNLPModel, /root/reference/src/utils.jl:411-581 and
    the device compression kernels of
    /root/reference/ext/ExaModelsKernelAbstractions.jl:1290-1319).

    Sort-once at build; runtime compression is a single sorted segment_sum —
    needed by consumers that reject repeated coordinates.
    """

    def __init__(self, inner):
        super().__init__(inner)
        jr, jc = inner.jac_structure()
        hr, hc = inner.hess_structure()
        self._jperm, self._jseg, self._jrows, self._jcols = self._plan(jr, jc, inner.ncon)
        self._hperm, self._hseg, self._hrows, self._hcols = self._plan(hr, hc, inner.nvar)
        self.nnzj = len(self._jrows)
        self.nnzh = len(self._hrows)
        self._jperm_j = jnp.asarray(self._jperm)
        self._jseg_j = jnp.asarray(self._jseg)
        self._hperm_j = jnp.asarray(self._hperm)
        self._hseg_j = jnp.asarray(self._hseg)
        self._jit_jcompress = jax.jit(
            lambda v: jax.ops.segment_sum(
                v[self._jperm_j], self._jseg_j, num_segments=self.nnzj,
                indices_are_sorted=True,
            )
        )
        self._jit_hcompress = jax.jit(
            lambda v: jax.ops.segment_sum(
                v[self._hperm_j], self._hseg_j, num_segments=self.nnzh,
                indices_are_sorted=True,
            )
        )

    @staticmethod
    def _plan(rows, cols, ncols_hint):
        from ..native import coo_compress_plan

        return coo_compress_plan(rows, cols)

    def jac_structure(self):
        return self._jrows, self._jcols

    def hess_structure(self):
        return self._hrows, self._hcols

    def jac_coord(self, x, **kw):
        return self._jit_jcompress(self.inner.jac_coord(x, **kw))

    def hess_coord(self, x, y=None, **kw):
        return self._jit_hcompress(self.inner.hess_coord(x, y, **kw))

    def obj(self, *a, **k):
        return self.inner.obj(*a, **k)

    def grad(self, *a, **k):
        return self.inner.grad(*a, **k)

    def cons(self, *a, **k):
        return self.inner.cons(*a, **k)

    def jprod(self, *a, **k):
        return self.inner.jprod(*a, **k)

    def jtprod(self, *a, **k):
        return self.inner.jtprod(*a, **k)

    def hprod(self, *a, **k):
        return self.inner.hprod(*a, **k)

    def __repr__(self):
        return (
            f"CompressedModel(nnzj {self.inner.nnzj}->{self.nnzj}, "
            f"nnzh {self.inner.nnzh}->{self.nnzh}) of {self.inner!r}"
        )


class WrapperModel(_Forwarding):
    """Host-array bridge: every oracle takes/returns numpy, with device
    transfer inside (parity: WrapperNLPModel, /root/reference/src/utils.jl:
    16-267 — the device↔host shuttle for CPU solvers like Ipopt)."""

    def __init__(self, inner):
        super().__init__(inner)

    def __repr__(self):
        return f"WrapperModel of {self.inner!r}"


for _name in _ORACLE_METHODS:
    def _make_w(nm):
        def method(self, *args, **kw):
            out = getattr(self.inner, nm)(*args, **kw)
            return np.asarray(out)

        method.__name__ = nm
        return method

    setattr(WrapperModel, _name, _make_w(_name))

for _name in ("x0", "y0", "lvar", "uvar", "lcon", "ucon"):
    def _make_p(nm):
        return property(lambda self, nm=nm: np.asarray(getattr(self.inner, nm)))

    setattr(WrapperModel, _name, _make_p(_name))
