"""Benchmark: Hessian+Jacobian derivative-evaluation throughput on AC-OPF.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Problem (mirrors /root/reference/benchmark/runbenchmark.jl:173-236): synthetic
10k-bus AC-OPF (no pglib data in the zero-egress image; same 15-pattern
structure and density as pglib cases), fused hess_coord + jac_coord — the
north-star derivative hot path of BASELINE.json.

Measurement protocol — device-resident scan with checksum readback:

  The naive "dispatch in a loop + block_until_ready" protocol is WRONG on
  this machine: through the remote-TPU tunnel, `block_until_ready` returns
  before device completion, and per-dispatch round-trip latency (~7-9 ms)
  dwarfs device compute. Instead we run K back-to-back evals inside ONE
  jitted `lax.scan`, fold every output element into a scalar checksum
  carried across iterations (so XLA cannot dead-code-eliminate any entry),
  and force a host readback of the checksum as the only true barrier.
  Per-eval time is the SLOPE between two K values, which cancels the fixed
  dispatch + readback overhead:

      evals/sec = (K2 - K1) / (T(K2) - T(K1)),  best of REPS trials.

  Each scan iteration perturbs x so no two evals share inputs (no CSE).

vs_baseline is the ratio to bench_baseline.json committed in-repo
(re-established 2026-08-18 when the protocol was fixed; later rounds must
beat it).
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

NBUS = int(os.environ.get("BENCH_NBUS", "10000"))
REPS = int(os.environ.get("BENCH_REPS", "3"))
K1 = int(os.environ.get("BENCH_K1", "4"))
K2 = int(os.environ.get("BENCH_K2", "36"))
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

    def make_scan(K):
        eps = jnp.arange(K, dtype=model.dtype) * 1e-9

        def body(c, e):
            h, j = model._hess_jac_impl(st, x + e, y, w, th)
            # fold EVERY output element into the carried checksum: no entry
            # is dead, so XLA must fully evaluate both COO value arrays
            return c + h.sum() + j.sum(), None

        return jax.jit(
            lambda: jax.lax.scan(body, jnp.asarray(0.0, model.dtype), eps)[0]
        )

    f1, f2 = make_scan(K1), make_scan(K2)

    t0 = time.time()
    checksum = float(f1())  # compile + warm; host readback = true barrier
    float(f2())
    compile_s = time.time() - t0

    def timed(f):
        t0 = time.perf_counter()
        float(f())
        return time.perf_counter() - t0

    best = min((timed(f2) - timed(f1)) / (K2 - K1) for _ in range(max(1, REPS)))
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
                    "protocol": "scan-slope checksum readback",
                },
                f,
            )

    print(
        json.dumps(
            {
                "metric": f"hess+jac evals/sec, AC-OPF {NBUS}-bus "
                f"(nvar={model.nvar}, nnzh={model.nnzh}, nnzj={model.nnzj}, "
                f"dtype={model.dtype.name}, device={jax.devices()[0].platform}, "
                f"build={build_s:.0f}s, compile={compile_s:.0f}s, "
                f"checksum={checksum:.6g})",
                "value": round(evals_per_sec, 3),
                "unit": "evals/sec",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
