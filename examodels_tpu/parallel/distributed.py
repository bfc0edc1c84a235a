"""Multi-host entry point: make an N-host run a flag, not a rewrite.

The reference has no distributed backend at all (SURVEY.md §2.6); our
scenario-sharded Schur KKT (solver/schur.py) is already written against a
`jax.sharding.Mesh`, so multi-host is only an initialization question:
call `init_distributed(...)` (or rely on TPU pod auto-detection) before
building the mesh, then pass `mesh=scenario_mesh()` to `madipm`.

Typical pod-slice launch (same script on every host):

    from examodels_tpu.parallel import init_distributed, scenario_mesh
    init_distributed()                      # auto-detects on Cloud TPU
    mesh = scenario_mesh()                  # all global devices on "scen"
    r = madipm(model, linear_solver="schur", mesh=mesh)

GSPMD partitions the batched per-scenario factorization across all hosts'
devices; the Σ_s Schur reductions become psums over ICI (and DCN across
slices) — no hand-written transport, per SURVEY.md §5's comm inventory.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

__all__ = ["init_distributed", "scenario_mesh"]


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> int:
    """Initialize jax.distributed for a multi-host run and return the global
    device count. All arguments are auto-detected on Cloud TPU pods; on
    other clusters pass coordinator_address="host0:port", num_processes,
    process_id (one JAX process per host).

    Safe to call when already initialized (returns immediately) and in a
    single-process run (num_processes=1 skips initialization entirely).
    """
    import jax

    if num_processes == 1:
        return len(jax.devices())
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except RuntimeError as e:
        # already initialized: idempotent entry point
        if "already" not in str(e).lower():
            raise
    return len(jax.devices())


def scenario_mesh(axis: str = "scen", devices=None):
    """1-D mesh over all (global) devices for scenario sharding — the mesh
    `ScenarioSchurKKT` shards its batched per-scenario factorization over.
    Call after `init_distributed()` in multi-host runs so `jax.devices()`
    is the global device list."""
    import jax
    from jax.sharding import Mesh

    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs, (axis,))
