"""Two-stage stochastic AC optimal power flow (BASELINE config 5).

First stage: a base active-power dispatch pg0 per generator (decided before
demand uncertainty is realized). Second stage, replicated per scenario s
with `EachScenario()`: a full polar AC-OPF (same 15-pattern decomposition
as models/opf.py, parity /root/reference/benchmark/runbenchmark.jl:173-236)
under scenario-scaled loads, with the actual dispatch pg[s] tied to pg0 by
ramp constraints |pg[s,g] − pg0[g]| ≤ Δ_g and a quadratic redispatch cost.

The resulting KKT system is block-arrowhead over the scenario partition
(scenario-local Hessian/Jacobian blocks + a pg0 border from the ramp rows
and the redispatch cross terms) — exactly what `linear_solver="schur"`
(solver/schur.py) factors with a batched per-scenario Cholesky sharded over
a `Mesh(("scen",))`, Σ_s reductions riding ICI as GSPMD psums.

Structure parity: /root/reference/src/two_stage.jl:25-137 (EachScenario
replication, scenario-major layout) — the reference only annotates the
partition; here the solver exploits it.
"""

from __future__ import annotations

import math

import numpy as np

from ..core.math import cos, sin
from ..nlp.two_stage import EachScenario, TwoStageCore, TwoStageModel
from .opf import OPFData, parse_matpower, synthetic_case

__all__ = ["stochastic_opf_core", "stochastic_opf_model"]


def _scen_major(nscen: int, cols: dict) -> dict:
    """Replicate data columns scenario-major and prepend the scenario id:
    row (s, k) at position s*n + k (the layout EachScenario constraints
    require, two_stage.py)."""
    n = len(next(iter(cols.values())))
    out = {"s": np.repeat(np.arange(nscen), n)}
    for k, v in cols.items():
        out[k] = np.tile(np.asarray(v), nscen)
    return out


def stochastic_opf_core(
    data: OPFData,
    nscen: int,
    *,
    load_sigma: float = 0.1,
    ramp_frac: float = 0.15,
    redispatch_cost: float = 1e3,
    seed: int = 11,
    dtype=None,
) -> TwoStageCore:
    """Build the two-stage stochastic AC-OPF core.

    load_sigma: per-scenario multiplicative load perturbation stddev
    (clipped to ±3σ); ramp_frac: ramp limit Δ_g = ramp_frac·(pmax−pmin);
    redispatch_cost: quadratic coefficient on (pg[s] − pg0) in the expected
    recourse cost.
    """
    d = data
    S = int(nscen)
    rng = np.random.default_rng(seed)
    sig = 1.0 + np.clip(
        rng.standard_normal(S) * load_sigma, -3 * load_sigma, 3 * load_sigma
    )

    c = TwoStageCore(S, dtype)

    # ---- first stage: base dispatch --------------------------------------
    pg0 = c.add_var(
        d.ngen, lvar=d.gen["pmin"], uvar=d.gen["pmax"],
        start=0.5 * (d.gen["pmin"] + d.gen["pmax"]), name="pg0",
    )

    # ---- second stage variables (scenario-major blocks) -------------------
    pg = c.add_var(EachScenario(), d.ngen, lvar=d.gen["pmin"],
                   uvar=d.gen["pmax"], name="pg")
    qg = c.add_var(EachScenario(), d.ngen, lvar=d.gen["qmin"],
                   uvar=d.gen["qmax"], name="qg")
    p = c.add_var(EachScenario(), d.narc, lvar=-d.arc["rate_a"],
                  uvar=d.arc["rate_a"], name="p")
    q = c.add_var(EachScenario(), d.narc, lvar=-d.arc["rate_a"],
                  uvar=d.arc["rate_a"], name="q")
    va = c.add_var(EachScenario(), d.nbus, name="va")
    vm = c.add_var(EachScenario(), d.nbus, start=1.0, lvar=d.bus["vmin"],
                   uvar=d.bus["vmax"], name="vm")

    # ---- objective: base cost + expected redispatch cost ------------------
    c.add_obj(
        lambda g: g.c2 * pg0[g.i] ** 2 + g.c1 * pg0[g.i] + g.c0, d.gen
    )
    gen_s = _scen_major(S, {"i": d.gen["i"]})
    w = redispatch_cost / S
    c.add_obj(lambda t: w * (pg[t.s, t.i] - pg0[t.i]) ** 2, gen_s)

    # ---- per-scenario OPF constraints --------------------------------------
    ref_s = _scen_major(S, {"i": d.ref_buses})
    c.add_con(EachScenario(), lambda t: va[t.s, t.i], ref_s, name="c_ref_angle")

    br_s = _scen_major(S, d.branch)
    c.add_con(
        EachScenario(),
        lambda b: p[b.s, b.f_idx]
        - b.c5 * vm[b.s, b.f_bus] ** 2
        - b.c3 * (vm[b.s, b.f_bus] * vm[b.s, b.t_bus]
                  * cos(va[b.s, b.f_bus] - va[b.s, b.t_bus]))
        - b.c4 * (vm[b.s, b.f_bus] * vm[b.s, b.t_bus]
                  * sin(va[b.s, b.f_bus] - va[b.s, b.t_bus])),
        br_s,
        name="c_to_active_power_flow",
    )
    c.add_con(
        EachScenario(),
        lambda b: q[b.s, b.f_idx]
        + b.c6 * vm[b.s, b.f_bus] ** 2
        + b.c4 * (vm[b.s, b.f_bus] * vm[b.s, b.t_bus]
                  * cos(va[b.s, b.f_bus] - va[b.s, b.t_bus]))
        - b.c3 * (vm[b.s, b.f_bus] * vm[b.s, b.t_bus]
                  * sin(va[b.s, b.f_bus] - va[b.s, b.t_bus])),
        br_s,
        name="c_to_reactive_power_flow",
    )
    c.add_con(
        EachScenario(),
        lambda b: p[b.s, b.t_idx]
        - b.c7 * vm[b.s, b.t_bus] ** 2
        - b.c1 * (vm[b.s, b.t_bus] * vm[b.s, b.f_bus]
                  * cos(va[b.s, b.t_bus] - va[b.s, b.f_bus]))
        - b.c2 * (vm[b.s, b.t_bus] * vm[b.s, b.f_bus]
                  * sin(va[b.s, b.t_bus] - va[b.s, b.f_bus])),
        br_s,
        name="c_from_active_power_flow",
    )
    c.add_con(
        EachScenario(),
        lambda b: q[b.s, b.t_idx]
        + b.c8 * vm[b.s, b.t_bus] ** 2
        + b.c2 * (vm[b.s, b.t_bus] * vm[b.s, b.f_bus]
                  * cos(va[b.s, b.t_bus] - va[b.s, b.f_bus]))
        - b.c1 * (vm[b.s, b.t_bus] * vm[b.s, b.f_bus]
                  * sin(va[b.s, b.t_bus] - va[b.s, b.f_bus])),
        br_s,
        name="c_from_reactive_power_flow",
    )
    c.add_con(
        EachScenario(),
        lambda b: va[b.s, b.f_bus] - va[b.s, b.t_bus],
        br_s,
        lcon=np.tile(d.branch["angmin"], S),
        ucon=np.tile(d.branch["angmax"], S),
        name="c_phase_angle_diff",
    )

    # scenario-scaled loads: pd/qd columns carry the σ_s factor
    bus_s = _scen_major(S, d.bus)
    bus_s["pd"] = bus_s["pd"] * np.repeat(sig, d.nbus)
    bus_s["qd"] = bus_s["qd"] * np.repeat(sig, d.nbus)
    bal_p = c.add_con(
        EachScenario(),
        lambda b: b.pd + b.gs * vm[b.s, b.i] ** 2,
        bus_s,
        name="c_active_power_balance",
    )
    bal_q = c.add_con(
        EachScenario(),
        lambda b: b.qd - b.bs * vm[b.s, b.i] ** 2,
        bus_s,
        name="c_reactive_power_balance",
    )
    nbus = d.nbus
    arc_s = _scen_major(S, d.arc)
    c.add_con_aug(bal_p, lambda a: (a.s * nbus + a.bus, p[a.s, a.i]), arc_s)
    c.add_con_aug(bal_q, lambda a: (a.s * nbus + a.bus, q[a.s, a.i]), arc_s)
    gen_b = _scen_major(S, {"i": d.gen["i"], "bus": d.gen["bus"]})
    c.add_con_aug(bal_p, lambda g: (g.s * nbus + g.bus, -pg[g.s, g.i]), gen_b)
    c.add_con_aug(bal_q, lambda g: (g.s * nbus + g.bus, -qg[g.s, g.i]), gen_b)

    c.add_con(
        EachScenario(),
        lambda b: p[b.s, b.f_idx] ** 2 + q[b.s, b.f_idx] ** 2 - b.rate_a ** 2,
        br_s,
        lcon=-math.inf,
        ucon=0.0,
        name="c_from_thermal_limit",
    )
    c.add_con(
        EachScenario(),
        lambda b: p[b.s, b.t_idx] ** 2 + q[b.s, b.t_idx] ** 2 - b.rate_a ** 2,
        br_s,
        lcon=-math.inf,
        ucon=0.0,
        name="c_to_thermal_limit",
    )

    # ---- coupling: ramp limits tie pg[s] to the base dispatch -------------
    ramp = ramp_frac * (d.gen["pmax"] - d.gen["pmin"])
    c.add_con(
        EachScenario(),
        lambda t: pg[t.s, t.i] - pg0[t.i],
        gen_s,
        lcon=np.tile(-ramp, S),
        ucon=np.tile(ramp, S),
        name="c_ramp",
    )
    return c


def stochastic_opf_model(case, nscen: int, **kw) -> TwoStageModel:
    """`case`: OPFData, MATPOWER .m path, or int (synthetic nbus)."""
    if isinstance(case, OPFData):
        data = case
    elif isinstance(case, int):
        data = synthetic_case(case)
    else:
        data = parse_matpower(case)
    dtype = kw.pop("dtype", None)
    core = stochastic_opf_core(data, nscen, dtype=dtype, **kw)
    return TwoStageModel(core)
