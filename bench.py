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

if os.environ.get("BENCH_FORCE_CPU"):  # plumbing tests off-TPU (the axon
    import jax as _jax  # sitecustomize force-registers the TPU plugin, so

    _jax.config.update("jax_platforms", "cpu")  # the env var alone is not enough
else:
    # Point the persistent XLA cache at the COMMITTED in-repo directory:
    # the 10k-bus device-IPM loop costs ~10-30 min of cold remote-tunnel
    # compile, far over the driver's solver budget — but the compiled
    # executable deserializes from this cache in seconds. The cache is
    # warmed and committed by the build session; a fresh environment
    # running `python bench.py` hits it as long as jaxlib/backend match.
    # (examodels_tpu/__init__.py reads this env var before its first jit.)
    os.environ.setdefault(
        "EXAMODELS_TPU_CACHE_DIR", os.path.join(ROOT, ".xla_cache")
    )

NBUS = int(os.environ.get("BENCH_NBUS", "10000"))
REPS = int(os.environ.get("BENCH_REPS", "3"))
K1 = int(os.environ.get("BENCH_K1", "4"))
K2 = int(os.environ.get("BENCH_K2", "36"))
SOLVER = os.environ.get("BENCH_SOLVER", "1") != "0"
SOLVER_TOL = float(os.environ.get("BENCH_SOLVER_TOL", "1e-6"))
# hard wall budget for the solver phase: it runs in a subprocess that gets
# killed at the deadline, so a cold-cache compile marathon (~19 min for the
# 10k-bus device loop through the remote-compile tunnel, measured) can never
# starve the headline derivative metric. With a warm persistent XLA cache
# the phase finishes well inside the default.
SOLVER_BUDGET_S = float(os.environ.get("BENCH_SOLVER_BUDGET_S", "1800"))
# fallback instance size if the headline size cannot solve inside budget
# (e.g. cold XLA cache in a fresh environment): a smaller loop program whose
# cold compile fits comfortably. 0 disables the fallback.
SOLVER_FALLBACK_NBUS = int(os.environ.get("BENCH_SOLVER_FALLBACK_NBUS", "2000"))
# seconds held back for the fallback attempt while the headline size runs
SOLVER_FALLBACK_RESERVE_S = float(
    os.environ.get("BENCH_SOLVER_FALLBACK_RESERVE_S", "600")
)
BASELINE_FILE = os.path.join(ROOT, "bench_baseline.json")
SOLVER_BASELINE_FILE = os.path.join(ROOT, "bench_solver_baseline.json")


def bench_solver(model, nbus):
    """Second north-star metric (BASELINE.json): end-to-end IPM on the
    nbus-bus AC-OPF via madipm_hybrid (f32 on-device bulk + f64 host polish)
    to E0 <= 1e-6. Prints its own JSON line; iters/sec is the device f32
    loop's pure EXECUTION rate — coarse iterations over the summed dispatch
    walls (detail["loop_exec_s"]), which excludes compile and pre-loop
    one-time work exactly like the derivative metric's scan-slope protocol
    (and needs no second warm solve, halving the phase's budget).
    Returns True iff the solve was healthy and a nonzero rate was recorded."""
    import time as _t

    import jax

    from examodels_tpu.solver.ipm_device import madipm_hybrid

    t0 = _t.time()
    r = madipm_hybrid(model, tol=SOLVER_TOL, switch_tol=1e-4, max_iter=200)
    cold_wall = _t.time() - t0
    det = r.detail or {}

    coarse_iters = det.get("coarse_iterations", r.iterations)
    loop_exec_s = det.get("loop_exec_s", -1.0)
    iters_per_sec = (
        coarse_iters / loop_exec_s if loop_exec_s and loop_exec_s > 0 else 0.0
    )
    # first-class compile-time artifact: AOT compile seconds of the device
    # IPM loop, measured inside madipm_device at cache-miss time (small =
    # persistent-cache hit; large = cold remote compile)
    loop_compile_s = det.get("loop_compile_s", -1.0)

    healthy = bool(r.success and coarse_iters > 0 and iters_per_sec > 0)
    if os.environ.get("BENCH_FORCE_CPU"):
        healthy = False  # plumbing runs must never anchor the TPU baseline
    vs = 1.0
    base = {}
    if os.path.exists(SOLVER_BASELINE_FILE):
        with open(SOLVER_BASELINE_FILE) as f:
            base = json.load(f)
        if "nbus" in base:  # legacy flat single-entry layout
            base = {str(base["nbus"]): base}
    entry = base.get(str(nbus))
    if entry and entry.get("iters_per_sec"):
        vs = iters_per_sec / entry["iters_per_sec"]
    elif healthy:  # only a healthy solve may anchor the baseline
        base[str(nbus)] = {
            "iters_per_sec": iters_per_sec,
            "solve_wall_s": cold_wall,
            "iterations": r.iterations,
            "status": r.status,
            "loop_compile_s": loop_compile_s,
            "device": str(jax.devices()[0]),
            "recorded": time.strftime("%Y-%m-%d"),
            "protocol": "madipm_hybrid cold solve; rate = coarse iters "
            "/ summed device-loop dispatch walls (compile excluded)",
        }
        with open(SOLVER_BASELINE_FILE, "w") as f:
            json.dump(base, f, indent=1)

    print(
        json.dumps(
            {
                "metric": f"IPM iters/sec (f32 device-loop exec rate), "
                f"AC-OPF {nbus}-bus madipm_hybrid to E0<={SOLVER_TOL:g} "
                f"(status={r.status}, iters={r.iterations} "
                f"[coarse={det.get('coarse_iterations')}"
                f"+polish={det.get('polish_iterations')}], "
                f"solve_wall={cold_wall:.0f}s "
                f"[coarse={det.get('coarse_wall', 0):.0f}s "
                f"polish={det.get('polish_wall', 0):.0f}s], "
                f"loop_compile={loop_compile_s:.1f}s, "
                f"loop_exec={loop_exec_s:.1f}s, "
                f"prim_inf={r.primal_infeasibility:.1e}, "
                f"dual_inf={r.dual_infeasibility:.1e})",
                "value": round(iters_per_sec, 3),
                "unit": "iters/sec",
                "vs_baseline": round(vs, 3),
            }
        ),
        flush=True,
    )
    return healthy


def run_solver_phase():
    """Run the solver metric in budget-boxed subprocesses: first the
    headline NBUS, then (only if that failed or timed out) the smaller
    fallback size, so SOME nonzero iters/sec number is always recorded even
    on a fully cold XLA cache. The child's stdout is captured and relayed so
    the parent can detect whether a metric line was actually produced; a
    silent crash becomes an explicit FAILED line (advisor finding r3)."""
    import subprocess

    deadline = time.time() + SOLVER_BUDGET_S
    sizes = [NBUS]
    if SOLVER_FALLBACK_NBUS and SOLVER_FALLBACK_NBUS != NBUS:
        sizes.append(SOLVER_FALLBACK_NBUS)

    for i, nbus in enumerate(sizes):
        remaining = deadline - time.time()
        budget = remaining - (
            SOLVER_FALLBACK_RESERVE_S if i + 1 < len(sizes) else 0.0
        )
        if budget <= 60:
            continue
        env = dict(os.environ, BENCH_NBUS=str(nbus))
        out, rc, timed_out = "", None, False
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--solver-only"],
                timeout=budget, check=False, env=env,
                capture_output=True, text=True,
            )
            out, rc = p.stdout or "", p.returncode
            err_tail = (p.stderr or "")[-400:]
        except subprocess.TimeoutExpired as e:
            timed_out = True
            out = (e.stdout or b"")
            out = out.decode(errors="replace") if isinstance(out, bytes) else out

        emitted = ok = False
        for line in out.splitlines():
            if line.startswith("{") and '"metric"' in line:
                print(line, flush=True)
                emitted = True
                try:
                    ok = json.loads(line).get("value", 0) > 0
                except ValueError:
                    pass
        if timed_out and not emitted:
            print(
                json.dumps(
                    {
                        "metric": f"IPM solver bench at {nbus}-bus SKIPPED: "
                        f"exceeded {budget:.0f}s sub-budget "
                        "(cold XLA cache / missing .xla_cache entries)",
                        "value": 0.0,
                        "unit": "iters/sec",
                        "vs_baseline": 0.0,
                    }
                ),
                flush=True,
            )
        elif not emitted:
            print(
                json.dumps(
                    {
                        "metric": f"IPM solver bench at {nbus}-bus FAILED "
                        f"(rc={rc}): {err_tail}",
                        "value": 0.0,
                        "unit": "iters/sec",
                        "vs_baseline": 0.0,
                    }
                ),
                flush=True,
            )
        if ok:
            break


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

    # ONE compiled program with a dynamic trip count (fori_loop lowers to a
    # while_loop with a runtime bound): the K1 and K2 timings share the same
    # executable, halving bench compile time vs the two fixed-length scans
    # of rounds 1-2 (the eval program itself is identical).
    @jax.jit
    def run_k(k):
        def body(i, c):
            e = i.astype(model.dtype) * 1e-9
            h, j = model._hess_jac_impl(st, x + e, y, w, th)
            # fold EVERY output element into the carried checksum: no entry
            # is dead, so XLA must fully evaluate both COO value arrays
            return c + h.sum() + j.sum()

        return jax.lax.fori_loop(0, k, body, jnp.asarray(0.0, model.dtype))

    f1 = lambda: run_k(K1)  # noqa: E731
    f2 = lambda: run_k(K2)  # noqa: E731

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

    # solver metric first; the headline derivative-throughput line stays
    # LAST so the driver's single-line parse keeps tracking vs_baseline on
    # the same metric across rounds (both lines land in the recorded tail)
    if SOLVER:
        run_solver_phase()

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


def solver_only():
    """Child-process entry: build the model and run just the solver phase
    (its JSON line goes to the captured stdout; exit code signals health)."""
    from examodels_tpu.models import ac_opf_model

    try:
        ok = bench_solver(ac_opf_model(NBUS), NBUS)
    except Exception as e:
        print(
            json.dumps(
                {
                    "metric": f"IPM solver bench at {NBUS}-bus FAILED: "
                    f"{type(e).__name__}: {e}",
                    "value": 0.0,
                    "unit": "iters/sec",
                    "vs_baseline": 0.0,
                }
            ),
            flush=True,
        )
        sys.exit(3)
    sys.exit(0 if ok else 2)


if __name__ == "__main__":
    if "--solver-only" in sys.argv:
        solver_only()
    else:
        main()
