"""Probe: run the device-IPM loop at a given size on the axon TPU.

RESOLVED (2026-08-20, see scripts/probe_loop_matrix.py): the "kernel
fault" worker crashes at 2000/10000-bus were the runtime's per-dispatch
watchdog — any single dispatch running past ~60s kills the worker
(measured with a trivial matmul fori_loop: 42s survives, 60s crashes).
Not the Pallas gather (xla-gather loop crashed identically), not
blocktri/f32/nesting (every construct passes at small scale). Fixed by
chunked dispatch in madipm_device (solver/ipm_device.py): bounded
iterations per dispatch with the full solver state carried across
dispatches.

Usage:  python scripts/probe_10k_loop.py [nbus] [xla|pallas]
Runs madipm_device coarse (f32, tol 1e-4, max_iter 60) only, printing
status + loop_compile_s. Each new (nbus, gather) config pays the full
remote compile once; results land in the committed .xla_cache.
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("EXAMODELS_TPU_CACHE_DIR", os.path.join(ROOT, ".xla_cache"))

NBUS = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
GATHER = sys.argv[2] if len(sys.argv) > 2 else "pallas"
os.environ["EXAMODELS_TPU_GATHER"] = GATHER


def main():
    from examodels_tpu.models import ac_opf_model
    from examodels_tpu.solver.ipm_device import madipm_device

    t0 = time.time()
    model = ac_opf_model(NBUS)
    print(f"built {NBUS}-bus model in {time.time() - t0:.0f}s "
          f"(gather={GATHER}, pallas_plan={model._gplan is not None})",
          flush=True)
    t0 = time.time()
    r = madipm_device(
        model, tol=1e-4, factor_dtype="float32", acceptable_iter=5,
        acceptable_tol=1e-3, max_iter=60,
    )
    d = r.detail or {}
    it = max(r.iterations, 1)
    print(
        f"RESULT nbus={NBUS} gather={GATHER} status={r.status} "
        f"iters={r.iterations} wall={time.time() - t0:.0f}s "
        f"loop_compile={d.get('loop_compile_s', -1):.0f}s "
        f"loop_exec={d.get('loop_exec_s', -1):.1f}s "
        f"({d.get('loop_exec_s', 0) / it:.2f}s/iter, "
        f"kkt_trips={d.get('kkt_trips')} "
        f"backsolves={d.get('kkt_backsolves')} "
        f"= {d.get('kkt_backsolves', 0) / it:.0f}/iter) "
        f"prim_inf={r.primal_infeasibility:.2e} "
        f"dual_inf={r.dual_infeasibility:.2e} mu={r.mu:.1e}",
        flush=True,
    )


if __name__ == "__main__":
    main()
