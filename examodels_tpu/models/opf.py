"""AC optimal power flow in polar form — the reference's headline benchmark
(/root/reference/benchmark/runbenchmark.jl:173-236; docs/src/index.md:36-48).

Three pieces:
  * `parse_matpower(path)` — plain-text MATPOWER `.m` case parser (the
    reference delegates to ExaPowerIO/PowerModels; we parse directly since
    those are Julia-only).
  * `synthetic_case(nbus)` — deterministic synthetic radial+loop grid for
    benchmarking at any size without data downloads (zero-egress builds).
  * `ac_opf_core(data)` — the 15-pattern polar AC-OPF model, matching the
    reference's pattern structure exactly (6 var blocks, quadratic-cost
    objective, 2×2 power-flow patterns, angle-difference rows, bus balances
    built via dims-only add_con + 4 conaug scatter patterns, thermal limits).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

import numpy as np

from ..core.math import cos, sin
from ..nlp.core import ExaCore
from ..nlp.model import ExaModel

__all__ = [
    "OPFData", "parse_matpower", "synthetic_case", "ac_opf_core", "ac_opf_model",
]


@dataclass
class OPFData:
    """Per-component columns (0-based bus indices), mirroring the NamedTuple
    layout built by /root/reference/benchmark/runbenchmark.jl:63-150."""

    # bus: i, pd, qd, gs, bs, vmin, vmax
    bus: dict
    # gen: i, bus, pmin, pmax, qmin, qmax, c2, c1, c0
    gen: dict
    # branch: f_bus, t_bus, f_idx, t_idx, c1..c8, rate_a, angmin, angmax
    branch: dict
    # arc: i (arc id), bus, rate_a
    arc: dict
    ref_buses: np.ndarray
    baseMVA: float = 100.0

    @property
    def nbus(self):
        return len(self.bus["i"])

    @property
    def ngen(self):
        return len(self.gen["i"])

    @property
    def nbranch(self):
        return len(self.branch["f_bus"])

    @property
    def narc(self):
        return len(self.arc["i"])


def _branch_admittances(r, x, b_ch, tap, shift):
    """Compute the c1..c8 coefficients of the polar power-flow equations,
    matching the convention of the reference's data build
    (/root/reference/benchmark/runbenchmark.jl:63-150): series admittance
    g+jb = 1/(r+jx), total charging b_ch, complex tap ratio tap·e^{jθ}."""
    ys = 1.0 / (r + 1j * x)
    g, b = ys.real, ys.imag
    tr = tap * np.cos(shift)
    ti = tap * np.sin(shift)
    tm = tap**2
    # from-side (i->j):  Sf = (g+j(b+bc/2))/tm |Vf|² - ...
    g_fr = g / tm
    b_fr = (b + b_ch / 2) / tm
    g_to = g
    b_to = b + b_ch / 2
    # mixed coefficients
    c1 = (-g * tr - b * ti) / tm
    c2 = (-b * tr + g * ti) / tm
    c3 = (-g * tr + b * ti) / tm
    c4 = (-b * tr - g * ti) / tm
    c5 = g_fr
    c6 = b_fr
    c7 = g_to
    c8 = b_to
    return c1, c2, c3, c4, c5, c6, c7, c8


def _build_data(bus_raw, gen_raw, branch_raw, baseMVA, cost_raw) -> OPFData:
    """Assemble OPFData from raw MATPOWER-convention arrays (1-based bus ids
    remapped), per-unit normalized."""
    bus_ids = bus_raw[:, 0].astype(int)
    id2idx = {int(b): k for k, b in enumerate(bus_ids)}
    nbus = len(bus_ids)

    on = branch_raw[:, 10] != 0  # status
    br = branch_raw[on]
    nbr = br.shape[0]
    f_bus = np.array([id2idx[int(v)] for v in br[:, 0]])
    t_bus = np.array([id2idx[int(v)] for v in br[:, 1]])
    r, x_, b_ch = br[:, 2], br[:, 3], br[:, 4]
    tap = np.where(br[:, 8] == 0.0, 1.0, br[:, 8])
    shift = np.deg2rad(br[:, 9])
    rate_a = np.where(br[:, 5] <= 0.0, 1e5, br[:, 5]) / baseMVA
    angmin = np.deg2rad(br[:, 11])
    angmax = np.deg2rad(br[:, 12])
    c1, c2, c3, c4, c5, c6, c7, c8 = _branch_admittances(r, x_, b_ch, tap, shift)

    gon = gen_raw[:, 7] != 0
    gen = gen_raw[gon]
    ngen = gen.shape[0]
    gbus = np.array([id2idx[int(v)] for v in gen[:, 0]])
    cost = cost_raw[gon] if cost_raw is not None else None
    if cost is not None and cost.shape[1] >= 7:
        # MATPOWER polynomial cost rows: model, startup, shutdown, n, cN..c0
        n_coef = cost[:, 3].astype(int)
        cc2 = np.zeros(ngen)
        cc1 = np.zeros(ngen)
        cc0 = np.zeros(ngen)
        for k in range(ngen):
            coefs = cost[k, 4 : 4 + n_coef[k]]
            coefs = coefs[::-1]  # now c0, c1, c2, ...
            cc0[k] = coefs[0] if len(coefs) > 0 else 0.0
            cc1[k] = coefs[1] if len(coefs) > 1 else 0.0
            cc2[k] = coefs[2] if len(coefs) > 2 else 0.0
        cc1 = cc1 * baseMVA
        cc2 = cc2 * baseMVA**2
    else:
        cc2, cc1, cc0 = np.zeros(ngen), np.full(ngen, 100.0), np.zeros(ngen)

    # arcs: from-side arc k for branch k, to-side arc nbr + k
    arc_bus = np.concatenate([f_bus, t_bus])
    arc_rate = np.concatenate([rate_a, rate_a])

    ref = np.nonzero(bus_raw[:, 1] == 3)[0]
    if len(ref) == 0:
        ref = np.array([0])

    return OPFData(
        bus=dict(
            i=np.arange(nbus),
            pd=bus_raw[:, 2] / baseMVA,
            qd=bus_raw[:, 3] / baseMVA,
            gs=bus_raw[:, 4] / baseMVA,
            bs=bus_raw[:, 5] / baseMVA,
            vmin=bus_raw[:, 12],
            vmax=bus_raw[:, 11],
        ),
        gen=dict(
            i=np.arange(ngen),
            bus=gbus,
            pmin=gen[:, 9] / baseMVA,
            pmax=gen[:, 8] / baseMVA,
            qmin=gen[:, 4] / baseMVA,
            qmax=gen[:, 3] / baseMVA,
            c2=cc2, c1=cc1, c0=cc0,
        ),
        branch=dict(
            f_bus=f_bus, t_bus=t_bus,
            f_idx=np.arange(nbr), t_idx=nbr + np.arange(nbr),
            c1=c1, c2=c2, c3=c3, c4=c4, c5=c5, c6=c6, c7=c7, c8=c8,
            rate_a=rate_a, angmin=angmin, angmax=angmax,
        ),
        arc=dict(i=np.arange(2 * nbr), bus=arc_bus, rate_a=arc_rate),
        ref_buses=ref,
        baseMVA=baseMVA,
    )


def parse_matpower(path: str) -> OPFData:
    """Parse a MATPOWER .m case file (mpc.bus/gen/branch/gencost matrices).

    Uses the native C++ tokenizer (examodels_tpu.native) when available —
    the data-loader role ExaPowerIO.jl plays for the reference — with a
    pure-Python regex fallback."""
    with open(path) as f:
        text = f.read()

    from ..native import parse_matpower_text

    nat = parse_matpower_text(text)
    # require every matrix the builder indexes — a partial native parse
    # (e.g. one matrix bailed on a MATLAB construct) falls back to Python
    if nat is not None and all(k in nat for k in ("bus", "gen", "branch")):
        return _build_data(
            nat["bus"], nat["gen"], nat["branch"], nat["baseMVA"],
            nat.get("gencost"),
        )

    def matrix(name):
        mt = re.search(
            rf"mpc\.{name}\s*=\s*\[(.*?)\];", text, re.DOTALL
        )
        if mt is None:
            return None
        rows = []
        for line in mt.group(1).splitlines():
            line = line.split("%")[0].strip().rstrip(";")
            if not line:
                continue
            rows.append([float(v) for v in line.replace(",", " ").split()])
        width = max(len(r) for r in rows)
        return np.array([r + [0.0] * (width - len(r)) for r in rows])

    base = re.search(r"mpc\.baseMVA\s*=\s*([\d.eE+-]+)", text)
    baseMVA = float(base.group(1)) if base else 100.0
    return _build_data(
        matrix("bus"), matrix("gen"), matrix("branch"), baseMVA, matrix("gencost")
    )


def synthetic_case(nbus: int, *, seed: int = 7, chord_span: int = None) -> OPFData:
    """Deterministic synthetic grid: a ring backbone + random chords
    (≈1.4 branches/bus), ~20% generator buses — realistic AC-OPF pattern
    sizes at arbitrary scale for zero-egress benchmarking.

    `chord_span` caps the ring distance of the random chords (default:
    min(64, nbus // 10), the historical value — do not change it for the
    benchmark model, whose checksum is pinned across rounds). Small spans
    (e.g. 8) produce near-planar grids with thin graph cuts like real
    transmission networks — the regime where network partitioning
    (parallel/partition.py) pays."""
    rng = np.random.default_rng(seed)
    # ring backbone + geographically-local chords (real transmission grids
    # are near-planar: RCM bandwidth of pglib cases is O(100), which is what
    # makes the block-tridiagonal KKT factorization the right TPU backend)
    if chord_span is None:
        chord_span = min(64, nbus // 10)
    nbr_extra = int(0.6 * nbus)
    cf = rng.integers(0, nbus, nbr_extra)
    ct = (cf + rng.integers(2, max(3, chord_span), nbr_extra)) % nbus
    f = np.concatenate([np.arange(nbus), cf])
    t = np.concatenate([(np.arange(nbus) + 1) % nbus, ct])
    keep = f != t
    f, t = f[keep], t[keep]
    nbr = len(f)

    bus = np.zeros((nbus, 13))
    bus[:, 0] = np.arange(1, nbus + 1)
    bus[:, 1] = 1
    bus[0, 1] = 3  # ref
    bus[:, 2] = rng.uniform(10, 40, nbus)  # pd MW
    bus[:, 3] = rng.uniform(2, 12, nbus)  # qd
    bus[:, 11] = 1.06
    bus[:, 12] = 0.94

    # a generator every ~5 buses keeps power local (short transport paths)
    ngen = max(1, nbus // 5)
    gbus = 1 + (np.arange(ngen) * nbus) // ngen
    gen = np.zeros((ngen, 10))
    gen[:, 0] = gbus
    gen[:, 3] = 100.0  # qmax
    gen[:, 4] = -100.0
    gen[:, 7] = 1
    gen[:, 8] = rng.uniform(100, 300, ngen) * (nbus / ngen) / 2  # pmax
    gen[:, 9] = 0.0
    cost = np.zeros((ngen, 7))
    cost[:, 0] = 2
    cost[:, 3] = 3
    cost[:, 4] = rng.uniform(0.005, 0.05, ngen)  # c2
    cost[:, 5] = rng.uniform(20, 40, ngen)  # c1

    branch = np.zeros((nbr, 13))
    branch[:, 0] = f + 1
    branch[:, 1] = t + 1
    branch[:, 2] = rng.uniform(0.002, 0.01, nbr)  # r
    branch[:, 3] = rng.uniform(0.01, 0.06, nbr)  # x
    branch[:, 4] = rng.uniform(0.0, 0.04, nbr)  # b
    branch[:, 5] = rng.uniform(250, 500, nbr)  # rateA
    branch[:, 10] = 1
    branch[:, 11] = -30.0
    branch[:, 12] = 30.0

    return _build_data(bus, gen, branch, 100.0, cost)


def ac_opf_core(data: OPFData, *, dtype=None) -> ExaCore:
    """Polar-form AC-OPF with the reference's exact pattern decomposition
    (/root/reference/benchmark/runbenchmark.jl:173-236)."""
    d = data
    c = ExaCore(dtype)

    pg = c.add_var(d.ngen, lvar=d.gen["pmin"], uvar=d.gen["pmax"], name="pg")
    qg = c.add_var(d.ngen, lvar=d.gen["qmin"], uvar=d.gen["qmax"], name="qg")
    p = c.add_var(d.narc, lvar=-d.arc["rate_a"], uvar=d.arc["rate_a"], name="p")
    q = c.add_var(d.narc, lvar=-d.arc["rate_a"], uvar=d.arc["rate_a"], name="q")
    va = c.add_var(d.nbus, name="va")
    vm = c.add_var(d.nbus, start=1.0, lvar=d.bus["vmin"], uvar=d.bus["vmax"], name="vm")

    c.add_obj(
        lambda g: g.c2 * pg[g.i] ** 2 + g.c1 * pg[g.i] + g.c0,
        d.gen,
    )

    c.add_con(lambda i: va[i], d.ref_buses, name="c_ref_angle")

    br = d.branch
    c.add_con(
        lambda b: p[b.f_idx]
        - b.c5 * vm[b.f_bus] ** 2
        - b.c3 * (vm[b.f_bus] * vm[b.t_bus] * cos(va[b.f_bus] - va[b.t_bus]))
        - b.c4 * (vm[b.f_bus] * vm[b.t_bus] * sin(va[b.f_bus] - va[b.t_bus])),
        br,
        name="c_to_active_power_flow",
    )
    c.add_con(
        lambda b: q[b.f_idx]
        + b.c6 * vm[b.f_bus] ** 2
        + b.c4 * (vm[b.f_bus] * vm[b.t_bus] * cos(va[b.f_bus] - va[b.t_bus]))
        - b.c3 * (vm[b.f_bus] * vm[b.t_bus] * sin(va[b.f_bus] - va[b.t_bus])),
        br,
        name="c_to_reactive_power_flow",
    )
    c.add_con(
        lambda b: p[b.t_idx]
        - b.c7 * vm[b.t_bus] ** 2
        - b.c1 * (vm[b.t_bus] * vm[b.f_bus] * cos(va[b.t_bus] - va[b.f_bus]))
        - b.c2 * (vm[b.t_bus] * vm[b.f_bus] * sin(va[b.t_bus] - va[b.f_bus])),
        br,
        name="c_from_active_power_flow",
    )
    c.add_con(
        lambda b: q[b.t_idx]
        + b.c8 * vm[b.t_bus] ** 2
        + b.c2 * (vm[b.t_bus] * vm[b.f_bus] * cos(va[b.t_bus] - va[b.f_bus]))
        - b.c1 * (vm[b.t_bus] * vm[b.f_bus] * sin(va[b.t_bus] - va[b.f_bus])),
        br,
        name="c_from_reactive_power_flow",
    )
    c.add_con(
        lambda b: va[b.f_bus] - va[b.t_bus],
        br,
        lcon=br["angmin"],
        ucon=br["angmax"],
        name="c_phase_angle_diff",
    )

    bal_p = c.add_con(
        lambda b: b.pd + b.gs * vm[b.i] ** 2, d.bus, name="c_active_power_balance"
    )
    bal_q = c.add_con(
        lambda b: b.qd - b.bs * vm[b.i] ** 2, d.bus, name="c_reactive_power_balance"
    )

    c.add_con_aug(bal_p, lambda a: (a.bus, p[a.i]), d.arc)
    c.add_con_aug(bal_q, lambda a: (a.bus, q[a.i]), d.arc)
    c.add_con_aug(bal_p, lambda g: (g.bus, -pg[g.i]), d.gen)
    c.add_con_aug(bal_q, lambda g: (g.bus, -qg[g.i]), d.gen)

    c.add_con(
        lambda b: p[b.f_idx] ** 2 + q[b.f_idx] ** 2 - b.rate_a**2,
        br,
        lcon=-math.inf,
        ucon=0.0,
        name="c_from_thermal_limit",
    )
    c.add_con(
        lambda b: p[b.t_idx] ** 2 + q[b.t_idx] ** 2 - b.rate_a**2,
        br,
        lcon=-math.inf,
        ucon=0.0,
        name="c_to_thermal_limit",
    )
    return c


def ac_opf_model(case, **kw) -> ExaModel:
    """`case` is an OPFData, a path to a MATPOWER .m file, or an int
    (synthetic nbus)."""
    if isinstance(case, OPFData):
        data = case
    elif isinstance(case, int):
        data = synthetic_case(case)
    else:
        data = parse_matpower(case)
    return ExaModel(ac_opf_core(data, **kw))
