"""Bisect harness for the device-IPM-loop TPU worker crash ("kernel
fault") — RESOLVED 2026-08-20.

Matrix results (all on the axon TPU, committed .xla_cache):
  * LV-100 dense f64:           OK      * AC-OPF 200 dense f64:     OK
  * LV-2000 blocktri f64:       OK      * AC-OPF 200 blocktri f64:  OK
  * LV-2000 blocktri f32:       OK      * AC-OPF 200 blocktri f32:  OK
  * AC-OPF 2000/10000 blocktri f32: worker crash — with the Pallas
    gather AND the XLA gather, i.e. not the gather, and (above) not any
    single construct. Separate probe: a trivial matmul fori_loop dispatch
    targeted at 240s crashes the worker at exactly 60.0s while 42s
    survives → per-dispatch WATCHDOG. Fix: chunked dispatch in
    madipm_device (solver/ipm_device.py).

Usage:  python scripts/probe_loop_matrix.py lv2000-blocktri-f64 ...
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("EXAMODELS_TPU_CACHE_DIR", os.path.join(ROOT, ".xla_cache"))
os.environ.setdefault("EXAMODELS_TPU_GATHER", "xla")


def run(tag):
    from examodels_tpu.models import ac_opf_model, luksan_vlcek_model
    from examodels_tpu.solver.ipm_device import madipm_device

    mdl, solver, f = tag.split("-")
    model = (
        luksan_vlcek_model(int(mdl[2:])) if mdl.startswith("lv")
        else ac_opf_model(int(mdl[3:]))
    )
    kw = dict(
        tol=1e-4, max_iter=30, acceptable_iter=5, acceptable_tol=1e-3,
        linear_solver=solver,
    )
    if f == "f32":
        kw["factor_dtype"] = "float32"
    t0 = time.time()
    try:
        r = madipm_device(model, **kw)
        print(
            f"PROBE {tag}: OK status={r.status} iters={r.iterations} "
            f"wall={time.time() - t0:.0f}s "
            f"compile={(r.detail or {}).get('loop_compile_s', -1):.0f}s",
            flush=True,
        )
    except Exception as e:
        print(
            f"PROBE {tag}: CRASH {type(e).__name__} after "
            f"{time.time() - t0:.0f}s: {str(e)[:120]}",
            flush=True,
        )
        sys.exit(1)


if __name__ == "__main__":
    run(sys.argv[1])
