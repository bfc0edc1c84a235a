"""Benchmark: Hessian+Jacobian derivative-evaluation throughput on AC-OPF.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol (mirrors /root/reference/benchmark/runbenchmark.jl:83-120 — minimum
of repeated timed evals per callback): synthetic 10k-bus AC-OPF (no pglib
data in the zero-egress image; same 15-pattern structure and density as
pglib cases), jit-compiled hess_coord + jac_coord, warmed up, then timed.
Combined metric = evals/sec of one (Hessian + Jacobian) pair — the
north-star derivative hot path of BASELINE.json.

vs_baseline is the ratio to bench_baseline.json committed in-repo (first
run establishes it at 1.0; later rounds must beat it).
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

NBUS = int(os.environ.get("BENCH_NBUS", "10000"))
REPS = int(os.environ.get("BENCH_REPS", "30"))
BASELINE_FILE = os.path.join(ROOT, "bench_baseline.json")


def main():
    import jax
    import jax.numpy as jnp

    import numpy as np

    from examodels_tpu.models import ac_opf_model

    t0 = time.time()
    model = ac_opf_model(NBUS)
    build_s = time.time() - t0

    st = model._static
    x = model.x0 + 0.01
    y = jnp.asarray(np.random.default_rng(0).standard_normal(model.ncon),
                    dtype=model.dtype)
    w = jnp.asarray(1.0, model.dtype)
    th = model.theta

    # fused hess+jac: ONE dispatch per pair — the IPM's actual per-iteration
    # derivative evaluation shape (model._hess_jac_impl; the per-callback
    # split of the reference's NLPModels API costs a full extra launch on
    # these memory-light kernels)
    hess_jac = jax.jit(model._hess_jac_impl)

    # compile + warmup
    t0 = time.time()
    jax.block_until_ready(hess_jac(st, x, y, w, th))
    compile_s = time.time() - t0

    # timed: best-of blocks (reference uses @belapsed minima)
    def time_pair():
        t0 = time.perf_counter()
        for _ in range(5):
            hj = hess_jac(st, x, y, w, th)
        jax.block_until_ready(hj)
        return (time.perf_counter() - t0) / 5

    best = min(time_pair() for _ in range(max(1, REPS // 5)))
    evals_per_sec = 1.0 / best

    vs = 1.0
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f)
        if base.get("nbus") == NBUS and base.get("value"):
            vs = evals_per_sec / base["value"]
    else:
        with open(BASELINE_FILE, "w") as f:
            json.dump(
                {
                    "nbus": NBUS,
                    "value": evals_per_sec,
                    "device": str(jax.devices()[0]),
                    "recorded": time.strftime("%Y-%m-%d"),
                },
                f,
            )

    print(
        json.dumps(
            {
                "metric": f"hess+jac evals/sec, AC-OPF {NBUS}-bus "
                f"(nvar={model.nvar}, nnzh={model.nnzh}, nnzj={model.nnzj}, "
                f"dtype={model.dtype.name}, device={jax.devices()[0].platform}, "
                f"build={build_s:.0f}s, compile={compile_s:.0f}s)",
                "value": round(evals_per_sec, 3),
                "unit": "evals/sec",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
