"""COPS 3.0 test-problem library (Dolan, Moré & Munson, ANL/MCS-273), the
benchmark family exercised by the reference's COPSApp AOT suite
(/root/reference/test/COPSApp.jl/src/COPSApp.jl:5-20) and benchmark harness
(/root/reference/benchmark/runbenchmark.jl:246-283 — chain, elec).

Implemented from the published mathematical formulations (the reference pulls
these from the external COPSBenchmark.jl package, which is not vendored in
its repo). Each builder returns an ExaCore so callers can extend/inspect;
`*_model` wrappers freeze to ExaModel.

Grid problems (bearing/torsion/minsurf) encode the zero/Dirichlet boundary
with precomputed flat-index + 0/1-mask data columns, so each finite-difference
term is one SIMD pattern over the whole grid — the idiomatic analogue of the
reference's generator-over-index-set style.
"""

from __future__ import annotations

import math

import numpy as np

from ..core.math import cos, exp, sin, sqrt
from ..nlp.core import ExaCore
from ..nlp.model import ExaModel

__all__ = [
    "elec_core", "elec_model",
    "chain_core", "chain_model",
    "camshape_core", "camshape_model",
    "bearing_core", "bearing_model",
    "torsion_core", "torsion_model",
    "minsurf_core", "minsurf_model",
    "catmix_core", "catmix_model",
    "steering_core", "steering_model",
    "rocket_core", "rocket_model",
    "polygon_core", "polygon_model",
    "COPS_BUILDERS",
]


# ---------------------------------------------------------------------------
# elec — electrons on a sphere (Thomson problem)
# (/root/reference/benchmark/runbenchmark.jl:266-283)
# ---------------------------------------------------------------------------


def elec_core(np_: int, *, seed: int = 2713, dtype=None) -> ExaCore:
    rng = np.random.default_rng(seed)
    theta = 2 * math.pi * rng.random(np_)
    phi = math.pi * rng.random(np_)
    itr = [(i, j) for i in range(np_ - 1) for j in range(i + 1, np_)]

    c = ExaCore(dtype)
    x = c.add_var(np_, start=np.cos(theta) * np.sin(phi), name="x")
    y = c.add_var(np_, start=np.sin(theta) * np.sin(phi), name="y")
    z = c.add_var(np_, start=np.cos(phi), name="z")

    c.add_obj(
        lambda d: 1.0
        / sqrt(
            (x[d[0]] - x[d[1]]) ** 2
            + (y[d[0]] - y[d[1]]) ** 2
            + (z[d[0]] - z[d[1]]) ** 2
        ),
        itr,
    )
    c.add_con(lambda i: x[i] ** 2 + y[i] ** 2 + z[i] ** 2 - 1, range(np_), name="sphere")
    return c


def elec_model(np_: int, **kw) -> ExaModel:
    return ExaModel(elec_core(np_, **kw))


# ---------------------------------------------------------------------------
# chain — hanging chain of minimal potential energy
# (/root/reference/benchmark/runbenchmark.jl:246-264)
# ---------------------------------------------------------------------------


def chain_core(n: int, *, dtype=None) -> ExaCore:
    nh = max(2, (n - 4) // 4)
    L, a, b = 4.0, 1.0, 3.0
    tmin = 0.25 if b > a else 0.75
    tf = 1.0
    h = tf / nh

    c = ExaCore(dtype)
    ks = np.arange(1, nh + 2)  # 1..nh+1
    u = c.add_var(nh + 1, start=4 * abs(b - a) * (ks / nh - tmin), name="u")
    x1 = c.add_var(
        nh + 1, start=4 * abs(b - a) * ks / nh * (0.5 * ks / nh - tmin) + a, name="x1"
    )
    x2 = c.add_var(
        nh + 1,
        start=(4 * abs(b - a) * ks / nh * (0.5 * ks / nh - tmin) + a)
        * (4 * abs(b - a) * (ks / nh - tmin)),
        name="x2",
    )
    x3 = c.add_var(nh + 1, start=4 * abs(b - a) * (ks / nh - tmin), name="x3")

    c.add_obj(x2[nh])  # potential energy at t_f
    c.add_con(
        lambda j: x1[j + 1] - x1[j] - 0.5 * h * (u[j] + u[j + 1]), range(nh), name="c1"
    )
    c.add_con(x1[0] - a, name="c2")
    c.add_con(x1[nh] - b, name="c3")
    c.add_con(x2[0], name="c4")
    c.add_con(x3[0], name="c5")
    c.add_con(x3[nh] - L, name="c6")
    c.add_con(
        lambda j: x2[j + 1]
        - x2[j]
        - 0.5 * h * (x1[j] * sqrt(1 + u[j] ** 2) + x1[j + 1] * sqrt(1 + u[j + 1] ** 2)),
        range(nh),
        name="c7",
    )
    c.add_con(
        lambda j: x3[j + 1]
        - x3[j]
        - 0.5 * h * (sqrt(1 + u[j] ** 2) + sqrt(1 + u[j + 1] ** 2)),
        range(nh),
        name="c8",
    )
    return c


def chain_model(n: int, **kw) -> ExaModel:
    return ExaModel(chain_core(n, **kw))


# ---------------------------------------------------------------------------
# camshape — shape optimization of a convex cam (COPS problem 4)
# ---------------------------------------------------------------------------


def camshape_core(n: int, *, dtype=None) -> ExaCore:
    """maximize valve-opening area (π R_v/n) Σ r_i over radii r ∈ [R_min,
    R_max] at n equally-spaced angles, subject to polygon convexity
    (cross-product form r_i(r_{i−1}+r_{i+1}) − 2 r_{i−1} r_{i+1} cos dθ ≥ 0
    over the extended radius sequence with ghost values R_min/R_max) and the
    curvature bound |r_{i+1} − r_i| ≤ α dθ."""
    R_v, R_max, R_min = 1.0, 2.0, 1.0
    alpha = 1.5
    d_theta = 2 * math.pi / (5 * (n + 1))
    cd = math.cos(d_theta)

    c = ExaCore(dtype)
    r = c.add_var(n, start=(R_min + R_max) / 2, lvar=R_min, uvar=R_max, name="r")
    c.add_obj(lambda i: -(math.pi * R_v / n) * r[i], range(n))

    c.add_con(
        lambda i: r[i + 1] * (r[i] + r[i + 2]) - 2 * r[i] * r[i + 2] * cd,
        range(n - 2),
        lcon=0.0,
        ucon=math.inf,
        name="convexity",
    )
    # ghost radii r_{-1} = r_0 = R_min, r_{n} = r_{n+1} = R_max
    c.add_con(r[0] * (R_min + r[1]) - 2 * R_min * r[1] * cd,
              lcon=0.0, ucon=math.inf, name="cvx_lo1")
    c.add_con(R_min * (R_min + r[0]) - 2 * R_min * r[0] * cd,
              lcon=0.0, ucon=math.inf, name="cvx_lo0")
    c.add_con(r[n - 1] * (r[n - 2] + R_max) - 2 * r[n - 2] * R_max * cd,
              lcon=0.0, ucon=math.inf, name="cvx_hi0")
    c.add_con(R_max * (r[n - 1] + R_max) - 2 * r[n - 1] * R_max * cd,
              lcon=0.0, ucon=math.inf, name="cvx_hi1")
    lim = alpha * d_theta
    c.add_con(lambda i: r[i + 1] - r[i], range(n - 1), lcon=-lim, ucon=lim, name="curv")
    c.add_con(r[0] - R_min, lcon=-lim, ucon=lim, name="curv_lo")
    c.add_con(R_max - r[n - 1], lcon=-lim, ucon=lim, name="curv_hi")
    return c


def camshape_model(n: int, **kw) -> ExaModel:
    return ExaModel(camshape_core(n, **kw))


# ---------------------------------------------------------------------------
# grid helpers for the variational problems
# ---------------------------------------------------------------------------


def _grid_flat(nx: int, ny: int):
    """Interior-point flat index of grid node (i, j), i in 0..nx+1,
    j in 0..ny+1; boundary nodes map to (index 0, mask 0)."""

    def flat(i, j):
        if 1 <= i <= nx and 1 <= j <= ny:
            return (i - 1) * ny + (j - 1), 1.0
        return 0, 0.0

    return flat


# ---------------------------------------------------------------------------
# bearing — pressure distribution in a journal bearing (MINPACK-2 / COPS)
# ---------------------------------------------------------------------------


def bearing_core(nx: int, ny: int, *, dtype=None) -> ExaCore:
    """min (1/2)∬ wq(x)|∇v|² − ∬ wl(x) v over v ≥ 0 on (0,2π)×(0,2b),
    v = 0 on the boundary; wq = (1+e cos x)³, wl = e sin x; five-point
    finite differences, interior unknowns only."""
    b, e = 10.0, 0.1
    hx = 2 * math.pi / (nx + 1)
    hy = 2 * b / (ny + 1)
    xs = hx * np.arange(0, nx + 2)
    wq = (1.0 + e * np.cos(xs)) ** 3

    c = ExaCore(dtype)
    start = np.maximum(np.sin(xs[1 : nx + 1]), 0.0)[:, None] * np.ones((1, ny))
    v = c.add_var(nx * ny, start=start.reshape(-1), lvar=0.0, name="v")
    flat = _grid_flat(nx, ny)

    # x-direction gradient terms, half-point weights
    xrows = []
    for i in range(nx + 1):
        for j in range(1, ny + 1):
            hi_ix, hi_m = flat(i + 1, j)
            lo_ix, lo_m = flat(i, j)
            w = 0.5 * (wq[i] + wq[i + 1])
            xrows.append((hi_ix, hi_m, lo_ix, lo_m, w))
    cx = hy / (2.0 * hx)
    c.add_obj(
        lambda d: cx * d[4] * (d[1] * v[d[0]] - d[3] * v[d[2]]) ** 2, xrows
    )

    # y-direction gradient terms, integer-line weights
    yrows = []
    for i in range(1, nx + 1):
        for j in range(ny + 1):
            hi_ix, hi_m = flat(i, j + 1)
            lo_ix, lo_m = flat(i, j)
            yrows.append((hi_ix, hi_m, lo_ix, lo_m, wq[i]))
    cy = hx / (2.0 * hy)
    c.add_obj(
        lambda d: cy * d[4] * (d[1] * v[d[0]] - d[3] * v[d[2]]) ** 2, yrows
    )

    # load term −hx hy Σ wl_i v_ij
    lrows = [
        ((i - 1) * ny + (j - 1), e * math.sin(xs[i]))
        for i in range(1, nx + 1)
        for j in range(1, ny + 1)
    ]
    c.add_obj(lambda d: -(hx * hy) * d[1] * v[d[0]], lrows)
    return c


def bearing_model(nx: int, ny: int, **kw) -> ExaModel:
    return ExaModel(bearing_core(nx, ny, **kw))


# ---------------------------------------------------------------------------
# torsion — elastic-plastic torsion (MINPACK-2 / COPS)
# ---------------------------------------------------------------------------


def torsion_core(nx: int, ny: int, *, c_coef: float = 5.0, dtype=None) -> ExaCore:
    """min (1/2)∬|∇v|² − C∬v on the unit square, v = 0 on the boundary,
    |v(x,y)| ≤ dist((x,y), ∂D)."""
    hx = 1.0 / (nx + 1)
    hy = 1.0 / (ny + 1)

    dist = np.zeros((nx, ny))
    for i in range(1, nx + 1):
        for j in range(1, ny + 1):
            x, y = i * hx, j * hy
            dist[i - 1, j - 1] = min(x, 1 - x, y, 1 - y)

    c = ExaCore(dtype)
    v = c.add_var(
        nx * ny,
        start=dist.reshape(-1),
        lvar=-dist.reshape(-1),
        uvar=dist.reshape(-1),
        name="v",
    )
    flat = _grid_flat(nx, ny)

    rows = []
    for i in range(nx + 1):
        for j in range(1, ny + 1):
            hi_ix, hi_m = flat(i + 1, j)
            lo_ix, lo_m = flat(i, j)
            rows.append((hi_ix, hi_m, lo_ix, lo_m))
    cx = hy / (2.0 * hx)
    c.add_obj(lambda d: cx * (d[1] * v[d[0]] - d[3] * v[d[2]]) ** 2, rows)

    rows = []
    for i in range(1, nx + 1):
        for j in range(ny + 1):
            hi_ix, hi_m = flat(i, j + 1)
            lo_ix, lo_m = flat(i, j)
            rows.append((hi_ix, hi_m, lo_ix, lo_m))
    cy = hx / (2.0 * hy)
    c.add_obj(lambda d: cy * (d[1] * v[d[0]] - d[3] * v[d[2]]) ** 2, rows)

    c.add_obj(lambda k: -(c_coef * hx * hy) * v[k], range(nx * ny))
    return c


def torsion_model(nx: int, ny: int, **kw) -> ExaModel:
    return ExaModel(torsion_core(nx, ny, **kw))


# ---------------------------------------------------------------------------
# minsurf — minimal surface with obstacle (COPS problem 17)
# ---------------------------------------------------------------------------


def minsurf_core(nx: int, ny: int, *, dtype=None) -> ExaCore:
    """min ∬ √(1+|∇v|²) over the unit square with boundary data
    v(x,0)=v(x,1)=1−(2x−1)², v(0,y)=v(1,y)=0, and obstacle v ≥ 1 on
    [0.25,0.75]²; triangulated lower/upper element quadrature."""
    hx = 1.0 / (nx + 1)
    hy = 1.0 / (ny + 1)

    def bound_val(i, j):
        x = i * hx
        if j == 0 or j == ny + 1:
            return 1.0 - (2 * x - 1.0) ** 2
        return 0.0

    lvar = np.zeros((nx, ny))
    start = np.ones((nx, ny))
    for i in range(1, nx + 1):
        for j in range(1, ny + 1):
            x, y = i * hx, j * hy
            if 0.25 <= x <= 0.75 and 0.25 <= y <= 0.75:
                lvar[i - 1, j - 1] = 1.0
            else:
                lvar[i - 1, j - 1] = -math.inf
            start[i - 1, j - 1] = 1.0 - (2 * x - 1.0) ** 2

    c = ExaCore(dtype)
    v = c.add_var(nx * ny, start=start.reshape(-1), lvar=lvar.reshape(-1), name="v")
    flat = _grid_flat(nx, ny)

    def node_spec(i, j):
        """(flat_index, mask, boundary_value) for grid node (i,j)."""
        ix, m = flat(i, j)
        bv = 0.0 if m else bound_val(i, j)
        return ix, m, bv

    area = hx * hy / 2.0
    # lower triangles (i,j) -> (i+1,j), (i,j+1); upper: (i+1,j+1) -> partners
    rows = []
    for i in range(nx + 1):
        for j in range(ny + 1):
            o = node_spec(i, j)
            px = node_spec(i + 1, j)
            py = node_spec(i, j + 1)
            rows.append(o + px + py)  # lower triangle
            o2 = node_spec(i + 1, j + 1)
            rows.append(o2 + px + py)  # upper triangle (same edge nodes)

    def tri(d):
        v0 = d[1] * v[d[0]] + d[2]
        vx = d[4] * v[d[3]] + d[5]
        vy = d[7] * v[d[6]] + d[8]
        return area * sqrt(1.0 + ((vx - v0) / hx) ** 2 + ((vy - v0) / hy) ** 2)

    c.add_obj(tri, rows)
    return c


def minsurf_model(nx: int, ny: int, **kw) -> ExaModel:
    return ExaModel(minsurf_core(nx, ny, **kw))


# ---------------------------------------------------------------------------
# catmix — catalyst mixing (COPS problem 14)
# ---------------------------------------------------------------------------


def catmix_core(nh: int, *, dtype=None) -> ExaCore:
    """min −1 + x1(tf) + x2(tf) over mixing policy u ∈ [0,1];
    x1' = u(10 x2 − x1), x2' = u(x1 − 10 x2) − (1 − u) x2, x(0) = (1, 0),
    tf = 1; trapezoidal collocation with nh intervals."""
    tf = 1.0
    h = tf / nh

    c = ExaCore(dtype)
    u = c.add_var(nh + 1, start=0.0, lvar=0.0, uvar=1.0, name="u")
    x1 = c.add_var(nh + 1, start=1.0, name="x1")
    x2 = c.add_var(nh + 1, start=0.0, name="x2")

    c.add_obj(-1.0 + x1[nh] + x2[nh])

    def f1(j):
        return u[j] * (10.0 * x2[j] - x1[j])

    def f2(j):
        return u[j] * (x1[j] - 10.0 * x2[j]) - (1.0 - u[j]) * x2[j]

    c.add_con(
        lambda j: x1[j + 1] - x1[j] - 0.5 * h * (f1(j) + f1(j + 1)),
        range(nh),
        name="ode1",
    )
    c.add_con(
        lambda j: x2[j + 1] - x2[j] - 0.5 * h * (f2(j) + f2(j + 1)),
        range(nh),
        name="ode2",
    )
    c.add_con(x1[0] - 1.0, name="ic1")
    c.add_con(x2[0], name="ic2")
    return c


def catmix_model(nh: int, **kw) -> ExaModel:
    return ExaModel(catmix_core(nh, **kw))


# ---------------------------------------------------------------------------
# steering — particle steering (COPS problem 8)
# ---------------------------------------------------------------------------


def steering_core(nh: int, *, dtype=None) -> ExaCore:
    """min t_f: steer a particle with bounded thrust angle u to a target
    height/velocity; y1'=y3, y2'=y4, y3'=a cos u, y4'=a sin u,
    y(0)=0, y2(tf)=5, y3(tf)=45, y4(tf)=0; trapezoidal collocation."""
    a = 100.0

    c = ExaCore(dtype)
    tf = c.add_var(1, start=1.0, lvar=0.0, name="tf")
    u = c.add_var(nh + 1, start=0.0, lvar=-math.pi / 2, uvar=math.pi / 2, name="u")
    ks = np.arange(nh + 1) / nh
    y1 = c.add_var(nh + 1, start=5 * ks, name="y1")
    y2 = c.add_var(nh + 1, start=5 * ks, name="y2")
    y3 = c.add_var(nh + 1, start=45 * ks, name="y3")
    y4 = c.add_var(nh + 1, start=0.0, name="y4")

    c.add_obj(tf[0])
    h_of = lambda: tf[0] * (1.0 / nh)  # noqa: E731

    c.add_con(
        lambda j: y1[j + 1] - y1[j] - 0.5 * h_of() * (y3[j] + y3[j + 1]),
        range(nh), name="d1",
    )
    c.add_con(
        lambda j: y2[j + 1] - y2[j] - 0.5 * h_of() * (y4[j] + y4[j + 1]),
        range(nh), name="d2",
    )
    c.add_con(
        lambda j: y3[j + 1] - y3[j] - 0.5 * h_of() * (a * cos(u[j]) + a * cos(u[j + 1])),
        range(nh), name="d3",
    )
    c.add_con(
        lambda j: y4[j + 1] - y4[j] - 0.5 * h_of() * (a * sin(u[j]) + a * sin(u[j + 1])),
        range(nh), name="d4",
    )
    c.add_con(y1[0], name="ic1")
    c.add_con(y2[0], name="ic2")
    c.add_con(y3[0], name="ic3")
    c.add_con(y4[0], name="ic4")
    c.add_con(y2[nh] - 5.0, name="tc2")
    c.add_con(y3[nh] - 45.0, name="tc3")
    c.add_con(y4[nh], name="tc4")
    return c


def steering_model(nh: int, **kw) -> ExaModel:
    return ExaModel(steering_core(nh, **kw))


# ---------------------------------------------------------------------------
# rocket — Goddard rocket maximum ascent (COPS problem 10)
# ---------------------------------------------------------------------------


def rocket_core(nh: int, *, dtype=None) -> ExaCore:
    """max h(tf): h'=v, v'=(T − D(h,v))/m − g(h), m'=−T/c, free tf;
    normalized Goddard problem with D = Dc v² exp(−hc(h−h0)/h0),
    g = g0 (h0/h)², trapezoidal collocation."""
    h0, v0, m0, g0 = 1.0, 0.0, 1.0, 1.0
    Tc, hc, vc, mc = 3.5, 500.0, 620.0, 0.6
    c_ = 0.5 * math.sqrt(g0 * h0)
    mf = mc * m0
    Dc = 0.5 * vc * m0 / g0
    T_max = Tc * g0 * m0

    c = ExaCore(dtype)
    step = c.add_var(1, start=1.0 / nh, lvar=0.0, name="step")  # Δt (uniform)
    h = c.add_var(nh + 1, start=1.0, lvar=h0, name="h")
    v = c.add_var(nh + 1, start=[i / nh * (1.0 - i / nh) for i in range(nh + 1)],
                  lvar=0.0, name="v")
    m = c.add_var(nh + 1, start=[(mf - m0) * (i / nh) + m0 for i in range(nh + 1)],
                  lvar=mf, uvar=m0, name="m")
    T = c.add_var(nh + 1, start=T_max / 2.0, lvar=0.0, uvar=T_max, name="T")

    c.add_obj(-h[nh])  # maximize final height

    def drag(j):
        return Dc * v[j] ** 2 * exp(-hc * (h[j] - h0) / h0)

    def grav(j):
        return g0 * (h0 / h[j]) ** 2

    def dv(j):
        return (T[j] - drag(j)) / m[j] - grav(j)

    c.add_con(
        lambda j: h[j + 1] - h[j] - 0.5 * step[0] * (v[j] + v[j + 1]),
        range(nh), name="dh",
    )
    c.add_con(
        lambda j: v[j + 1] - v[j] - 0.5 * step[0] * (dv(j) + dv(j + 1)),
        range(nh), name="dv",
    )
    c.add_con(
        lambda j: m[j + 1] - m[j] + 0.5 * step[0] * (T[j] + T[j + 1]) / c_,
        range(nh), name="dm",
    )
    c.add_con(h[0] - h0, name="ic_h")
    c.add_con(v[0] - v0, name="ic_v")
    c.add_con(m[0] - m0, name="ic_m")
    c.add_con(m[nh] - mf, name="tc_m")
    return c


def rocket_model(nh: int, **kw) -> ExaModel:
    return ExaModel(rocket_core(nh, **kw))


# ---------------------------------------------------------------------------
# polygon — largest small polygon (COPS problem 1)
# ---------------------------------------------------------------------------


def polygon_core(nv: int, *, dtype=None) -> ExaCore:
    """max area of a polygon of unit diameter with nv vertices in polar
    coordinates (r_i, θ_i), θ nondecreasing."""
    c = ExaCore(dtype)
    ks = np.arange(1, nv + 1)
    r = c.add_var(nv, start=1.0, lvar=0.0, uvar=1.0, name="r")
    th = c.add_var(nv, start=math.pi * ks / nv, lvar=0.0, uvar=math.pi, name="th")

    c.add_obj(
        lambda i: -0.5 * r[i + 1] * r[i] * sin(th[i + 1] - th[i]), range(nv - 1)
    )
    # diameter constraints over all vertex pairs
    pairs = [(i, j) for i in range(nv - 1) for j in range(i + 1, nv)]
    c.add_con(
        lambda d: r[d[0]] ** 2
        + r[d[1]] ** 2
        - 2.0 * r[d[0]] * r[d[1]] * cos(th[d[0]] - th[d[1]]),
        pairs,
        lcon=-math.inf,
        ucon=1.0,
        name="diam",
    )
    # ordering θ_{i+1} ≥ θ_i
    c.add_con(
        lambda i: th[i + 1] - th[i], range(nv - 1), lcon=0.0, ucon=math.inf,
        name="order",
    )
    c.add_con(r[nv - 1], name="rn")  # r_nv = 0 (anchor final vertex at origin)
    c.add_con(th[nv - 1] - math.pi, name="thn")
    return c


def polygon_model(nv: int, **kw) -> ExaModel:
    return ExaModel(polygon_core(nv, **kw))


COPS_BUILDERS = {
    "elec": elec_model,
    "chain": chain_model,
    "camshape": camshape_model,
    "bearing": bearing_model,
    "torsion": torsion_model,
    "minsurf": minsurf_model,
    "catmix": catmix_model,
    "steering": steering_model,
    "rocket": rocket_model,
    "polygon": polygon_model,
}
