"""Per-callback benchmark harness across the model suite — protocol parity
with /root/reference/benchmark/runbenchmark.jl:83-120,415-448: best-of
repeated timed evals per callback, CSV rows

    backend,instance,param,nvar,ncon,tobj,tcon,tgrad,tjac,thess

Usage: python benchmark/runbenchmark.py [--out results.csv] [--quick]
(platform comes from JAX_PLATFORMS / the ambient axon TPU).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def best_of(fn, reps=5, inner=3):
    import jax

    out = fn()
    jax.block_until_ready(out)  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn()
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def bench_model(name, param, model, rows):
    import jax
    import jax.numpy as jnp
    import numpy as np

    st = model._static
    x = model.x0 + 0.01
    y = jnp.asarray(np.random.default_rng(0).standard_normal(model.ncon),
                    dtype=model.dtype)
    w = jnp.asarray(1.0, model.dtype)
    th = model.theta
    obj = jax.jit(model._obj_impl)
    cons = jax.jit(model._cons_impl)
    grad = jax.jit(model._grad_impl)
    jac = jax.jit(model._jac_impl)
    hess = jax.jit(model._hess_impl)

    tobj = best_of(lambda: obj(st, x, th))
    tcon = best_of(lambda: cons(st, x, th))
    tgrad = best_of(lambda: grad(st, x, th))
    tjac = best_of(lambda: jac(st, x, th))
    thess = best_of(lambda: hess(st, x, y, w, th))
    backend = jax.devices()[0].platform
    row = (f"{backend},{name},{param},{model.nvar},{model.ncon},"
           f"{tobj:.3e},{tcon:.3e},{tgrad:.3e},{tjac:.3e},{thess:.3e}")
    print(row, flush=True)
    rows.append(row)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    from examodels_tpu.models import (
        ac_opf_model,
        chain_model,
        elec_model,
        luksan_vlcek_model,
    )

    suite = [
        ("rosenrock", "1000", lambda: luksan_vlcek_model(1000)),
        ("rosenrock", "10000", lambda: luksan_vlcek_model(10000)),
        ("OPF", "syn1000", lambda: ac_opf_model(1000)),
        ("chain", "400", lambda: chain_model(400)),
        ("elec", "100", lambda: elec_model(100)),
    ]
    if not args.quick:
        suite += [
            ("rosenrock", "100000", lambda: luksan_vlcek_model(100000)),
            ("OPF", "syn10000", lambda: ac_opf_model(10000)),
            ("elec", "400", lambda: elec_model(400)),
        ]

    rows = ["backend,instance,param,nvar,ncon,tobj,tcon,tgrad,tjac,thess"]
    print(rows[0], flush=True)
    for name, param, build in suite:
        bench_model(name, param, build(), rows)

    if args.out:
        with open(args.out, "w") as f:
            f.write("\n".join(rows) + "\n")


if __name__ == "__main__":
    main()
