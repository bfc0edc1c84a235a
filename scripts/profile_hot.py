"""Profile the components of the fused hess+jac eval on the real TPU.

Uses the same scan-slope checksum protocol as bench.py so per-dispatch
tunnel latency cancels. Reports per-eval ms for: full hess_jac, hess only,
jac only, cons, grad, and the segment-sum pieces in isolation.
"""
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp
import numpy as np

from examodels_tpu.models import ac_opf_model

NBUS = int(os.environ.get("PROF_NBUS", "10000"))
K1, K2 = 4, 20


def scan_time(fn, args, label):
    """fn(st, x, ...) -> pytree of arrays; time per eval via scan slope."""

    def make(k):
        @jax.jit
        def run(st, x, *rest):
            def body(carry, _):
                chk, xx = carry
                out = fn(st, xx, *rest)
                leaves = jax.tree_util.tree_leaves(out)
                s = sum(jnp.sum(l) for l in leaves)
                xx = xx + 1e-12 * s
                return (chk + s, xx), None

            (chk, _), _ = jax.lax.scan(body, (jnp.zeros((), x.dtype), x), None, length=k)
            return chk

        return run

    times = {}
    for k in (K1, K2):
        r = make(k)
        chk = r(*args)
        chk.block_until_ready()
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            float(r(*args))
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    per = (times[K2] - times[K1]) / (K2 - K1)
    print(f"{label:28s} {per*1e3:9.3f} ms/eval")
    return per


def main():
    model = ac_opf_model(NBUS)
    st = model._static
    x = model.x0 + 0.01
    y = jnp.asarray(np.random.default_rng(0).standard_normal(model.ncon), model.dtype)
    w = jnp.asarray(1.0, model.dtype)
    th = model.theta
    print(f"nbus={NBUS} nvar={model.nvar} ncon={model.ncon} nnzj={model.nnzj} nnzh={model.nnzh} dtype={model.dtype}")

    scan_time(lambda st, x: model._hess_jac_impl(st, x, y, w, th), (st, x), "hess_jac (fused)")
    scan_time(lambda st, x: model._hess_impl(st, x, y, w, th), (st, x), "hess only")
    scan_time(lambda st, x: model._jac_impl(st, x, th), (st, x), "jac only")
    scan_time(lambda st, x: model._cons_impl(st, x, th), (st, x), "cons")
    scan_time(lambda st, x: model._grad_impl(st, x, th), (st, x), "grad")
    scan_time(lambda st, x: model._obj_impl(st, x, th), (st, x), "obj")

    # segment-sum in isolation at gradient size
    from examodels_tpu.nlp.model import _sorted_segment_sum

    nnzg = model.nnzg
    vals = jnp.asarray(np.random.default_rng(1).standard_normal(nnzg), model.dtype)
    gb = st["gbounds"] if "gbounds" in st else None
    # grad path: perm-gather + segment
    gperm = st["gperm"]
    gids = st["gids"]

    def segsum(st, v):
        return jax.ops.segment_sum(v[st["gperm"]], st["gids"], num_segments=model.nvar, indices_are_sorted=True)

    scan_time(segsum, (st, vals), f"grad segment_sum ({nnzg} nnz)")

    # raw per-pattern work: vals/grads/hess without assembly
    def pat_hess_all(st, x):
        outs = []
        for rt, arrs in zip(model._obj_pats, st["obj"]):
            if rt.o2step:
                outs.append(model._pat_hess(rt, arrs, x, th).reshape(-1))
        for rt, arrs in zip(model._con_pats, st["con"]):
            if rt.o2step:
                outs.append(model._pat_hess(rt, arrs, x, th).reshape(-1))
        return jnp.concatenate(outs)

    scan_time(pat_hess_all, (st, x), "pattern hess (no y-scale)")

    def pat_grads_all(st, x):
        outs = [
            model._pat_grads(rt, arrs, x, th).reshape(-1)
            for rt, arrs in zip(model._con_pats, st["con"])
            if rt.p
        ]
        return jnp.concatenate(outs)

    scan_time(pat_grads_all, (st, x), "pattern jac grads")


if __name__ == "__main__":
    main()
