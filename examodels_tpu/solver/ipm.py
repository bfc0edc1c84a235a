"""Filter line-search interior-point solver (Wächter–Biegler) in JAX.

The reference stack stops at the NLPModels oracle API and hands solving to
external Ipopt/MadNLP (/root/reference/src/nlp.jl:460-463,
/root/reference/docs/src/index.md:60-63); our build ships the solver
on-device. Algorithm follows the Ipopt paper (Wächter & Biegler, Math.
Prog. 106, 2006): slack reformulation, gradient-based problem scaling,
primal-dual barrier Newton steps with condensed KKT solves (kkt.py),
inertia-free curvature regularization (the condensed AᵀA/δc term masks
null-space indefiniteness from Cholesky, so PD of the step is enforced by
a direct curvature test dᵀ(W+Σ+δw)d > 0 — the MadNLP "inertia-free" rule),
fraction-to-boundary, filter line search with second-order correction,
monotone Fiacco-McCormick barrier reduction, least-squares dual
initialization, acceptable-tolerance termination, and a penalty Gauss-
Newton feasibility-restoration fallback.

All heavy computation (oracle callbacks, KKT assembly+factorization, trial
point evaluation) is jitted; the outer iteration is a host loop in this
round (trial counts are data-dependent), with all state living on device.
"""

from __future__ import annotations

import dataclasses
import math
import time
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .kkt import CGKKT, DenseKKT, build_structure


@dataclass
class IPMOptions:
    tol: float = 1e-8
    acceptable_tol: float = 1e-6
    acceptable_iter: int = 15
    max_iter: int = 3000
    max_wall_time: float = 1e20
    mu_init: float = 1e-1
    mu_min_factor: float = 0.1  # μ floor = mu_min_factor * tol
    kappa_mu: float = 0.2
    theta_mu: float = 1.5
    kappa_eps: float = 10.0
    tau_min: float = 0.99
    s_max: float = 100.0
    # scaling (Ipopt gradient-based)
    scaling: bool = True
    scaling_max_gradient: float = 100.0
    # bound handling
    kappa_1: float = 1e-2
    kappa_2: float = 1e-2
    bound_relax_factor: float = 1e-8
    # filter / line search
    gamma_theta: float = 1e-5
    gamma_phi: float = 1e-8
    delta: float = 1.0
    s_theta: float = 1.1
    s_phi: float = 2.3
    eta_phi: float = 1e-8
    kappa_soc: float = 0.99
    max_soc: int = 4
    alpha_min_frac: float = 0.05
    max_ls: int = 30
    # regularization (inertia-free PD correction)
    delta_w0: float = 1e-4
    delta_w_min: float = 1e-20
    delta_w_max: float = 1e40
    kappa_w_plus: float = 8.0
    # first-ever inflation factor (Ipopt's kappa_w_plus_bar): until a δw
    # has ever been accepted, escalate 100x per rejection instead of 8x —
    # a mixed-precision factor can need δw ≈ 1 at the (ill-conditioned)
    # first iterate, and 8x from 1e-4 burns ~6 full KKT solves getting there
    kappa_w_plus_bar: float = 100.0
    kappa_w_minus: float = 1.0 / 3.0
    delta_c_bar: float = 1e-8
    delta_c_min: float = 0.0  # floor on the dual regularization (raised
    # automatically to 1e-5 with an f32 factorization: the condensed
    # system's scaled eigenvalues must stay above f32 epsilon)
    kappa_c: float = 0.25
    factor_dtype: object = None  # e.g. "float32": mixed-precision KKT
    # factorization (MXU) with f64 iterative refinement
    # mixed-precision Krylov recovery bounds (blocktri backend; see
    # BlockTriKKT.__init__ for the δc-amplification rationale)
    kkt_cg_maxiter: int = 120
    kkt_cg_accept: float = 1e-8
    # HyKKT/Golub-Greif dual recovery for the mixed-precision blocktri
    # backend: γ = frac/δc (0 disables → legacy condensed dy, the measured
    # 1/δc dual-poison path; see BlockTriKKT.__init__)
    kkt_hykkt_frac: float = 0.5
    # inner-PCG cap for each H_γ⁻¹ application inside the HyKKT dual CG
    kkt_cg_inner_maxiter: int = 32
    curvature_kappa: float = 1e-11  # dᵀKd ≥ κ·dᵀd requirement
    # dual safeguard / init
    kappa_sigma: float = 1e10
    y_init_max: float = 1e3
    # linear solver: "dense" | "cg" | "blocktri" | "schur" | None (auto:
    # schur for two-stage models above dense_limit, else by size)
    linear_solver: Optional[str] = None
    dense_limit: int = 6000
    # mesh for the scenario-sharded schur backend (axis name "scen")
    mesh: Optional[object] = None
    verbose: bool = False
    # chunked dispatch of the device IPM loop (madipm_device): bound each
    # device dispatch to ~this wall time — TPU runtimes kill dispatches
    # that run too long (this machine's axon worker: hard ~60s watchdog,
    # measured). inf = single-dispatch. chunk_stop is a traced scalar, so
    # neither option ever recompiles the loop.
    device_dispatch_budget_s: float = 25.0
    # iterations per dispatch; 0 = adapt to the budget (start at 4, grow
    # up to 8x per dispatch from the measured per-iteration rate)
    device_chunk_iters: int = 0
    # total wall budget for the device loop, checked BETWEEN chunks only
    # (granularity = one dispatch, i.e. up to ~device_dispatch_budget_s of
    # overrun past this value — a caller pairing a tight wall with a large
    # dispatch budget gets the coarser of the two). The solve returns its
    # current state with status "max_wall" when exceeded. madipm_hybrid
    # uses this to bound the coarse f32 stage — on hard instances where f32
    # steps stop paying, handing the current iterate to the f64 polish
    # beats burning the coarse iteration budget.
    device_max_wall_s: float = float("inf")


@dataclass
class IPMResult:
    x: Any = None
    y: Any = None
    zl: Any = None
    zu: Any = None
    status: str = "unknown"
    objective: float = float("nan")
    iterations: int = 0
    primal_infeasibility: float = float("nan")
    dual_infeasibility: float = float("nan")
    complementarity: float = float("nan")
    wall_time: float = 0.0
    mu: float = float("nan")
    detail: Optional[dict] = None  # stage breakdown (e.g. madipm_hybrid)

    @property
    def success(self) -> bool:
        return self.status in ("first_order", "acceptable")


_BIG = 1e20


class _Funcs:
    """Jitted barrier-problem callbacks over the slacked primal v = (x, s),
    with Ipopt gradient-based scaling baked in: the IPM sees the scaled
    problem  min σf·f(x)  s.t.  S·c(x) ∈ [S·lcon, S·ucon]."""

    def __init__(self, model, structure, dtype, opts: IPMOptions):
        self.model = model
        self.s = structure
        self.dtype = dtype
        nx, ns, m = structure.nx, structure.ns, structure.m
        self.obj_sign = 1.0 if model.minimize else -1.0
        st = model._static

        # ---- gradient-based scaling at x0 --------------------------------
        x0 = jnp.asarray(model.x0, dtype=dtype)
        th0 = model.theta
        if opts.scaling:
            g0 = np.asarray(model._grad_impl(st, x0, th0))
            gm = float(np.max(np.abs(g0), initial=0.0))
            sigma_f = min(1.0, opts.scaling_max_gradient / max(gm, 1e-8))
            jv0 = np.abs(np.asarray(model._jac_impl(st, x0, th0)))
            jr, _ = model.jac_structure()
            rowmax = np.zeros(m)
            if len(jv0):
                np.maximum.at(rowmax, np.asarray(jr), jv0)
            con_scale = np.minimum(
                1.0, opts.scaling_max_gradient / np.maximum(rowmax, 1e-8)
            )
        else:
            sigma_f = 1.0
            con_scale = np.ones(m)
        self.sigma_f = float(sigma_f)
        self.con_scale_np = con_scale
        self.con_scale = jnp.asarray(con_scale, dtype=dtype)
        jr, _ = model.jac_structure()
        self.jcoo_scale = jnp.asarray(con_scale[np.asarray(jr)], dtype=dtype)

        lcon = np.asarray(model.lcon, dtype=np.float64) * con_scale
        ucon = np.asarray(model.ucon, dtype=np.float64) * con_scale
        is_eq = np.asarray(model.lcon) == np.asarray(model.ucon)
        self.eq_rhs = jnp.asarray(np.where(is_eq, lcon, 0.0), dtype=dtype)
        self.is_eq = jnp.asarray(is_eq)
        self.ineq_rows = jnp.asarray(structure.ineq_rows)

        lv = np.concatenate([np.asarray(model.lvar, dtype=np.float64),
                             lcon[structure.ineq_rows]])
        uv = np.concatenate([np.asarray(model.uvar, dtype=np.float64),
                             ucon[structure.ineq_rows]])
        self.lraw = lv.copy()
        self.uraw = uv.copy()
        self.has_l = jnp.asarray(lv > -_BIG)
        self.has_u = jnp.asarray(uv < _BIG)
        self.l = jnp.asarray(np.where(lv > -_BIG, lv, 0.0), dtype=dtype)
        self.u = jnp.asarray(np.where(uv < _BIG, uv, 0.0), dtype=dtype)

        sf = self.obj_sign * self.sigma_f
        cs = self.con_scale
        jcs = self.jcoo_scale

        def split(v):
            return v[:nx], v[nx:]

        def resid(v, theta_p):
            x, s = split(v)
            c = cs * model._cons_impl(st, x, theta_p)
            r = c - self.eq_rhs
            if ns:
                r = r.at[self.ineq_rows].add(-s)
            return r

        def objv(v, theta_p):
            return sf * model._obj_impl(st, v[:nx], theta_p)

        def gradv(v, theta_p):
            g = sf * model._grad_impl(st, v[:nx], theta_p)
            return jnp.concatenate([g, jnp.zeros(ns, dtype=dtype)])

        def barrier(v, mu, theta_p):
            dl = jnp.where(self.has_l, v - self.l, 1.0)
            du = jnp.where(self.has_u, self.u - v, 1.0)
            return objv(v, theta_p) - mu * (
                jnp.sum(jnp.where(self.has_l, jnp.log(dl), 0.0))
                + jnp.sum(jnp.where(self.has_u, jnp.log(du), 0.0))
            )

        def theta(v, theta_p):
            return jnp.sum(jnp.abs(resid(v, theta_p)))

        def aty_of(x, y, theta_p):
            """Aᵀy over v for the scaled Jacobian A = [S·Jc | −P]."""
            out = jnp.zeros(nx + ns, dtype=dtype)
            out = out.at[:nx].set(model._jtprod_impl(st, x, cs * y, theta_p))
            if ns:
                out = out.at[nx + jnp.arange(ns)].add(-y[self.ineq_rows])
            return out

        def evals(v, y, zl, zu, mu, theta_p):
            x, _ = split(v)
            f = objv(v, theta_p)
            g = gradv(v, theta_p)
            r = resid(v, theta_p)
            jvals = jcs * model._jac_impl(st, x, theta_p)
            hvals = model._hess_impl(
                st, x, cs * y, jnp.asarray(sf, dtype), theta_p
            )
            dl = jnp.where(self.has_l, v - self.l, 1.0)
            du = jnp.where(self.has_u, self.u - v, 1.0)
            aty = aty_of(x, y, theta_p)
            r_d = g + aty - jnp.where(self.has_l, zl, 0.0) + jnp.where(self.has_u, zu, 0.0)
            comp_l = jnp.where(self.has_l, dl * zl - mu, 0.0)
            comp_u = jnp.where(self.has_u, du * zu - mu, 0.0)
            sigma = (
                jnp.where(self.has_l, zl / dl, 0.0)
                + jnp.where(self.has_u, zu / du, 0.0)
            )
            r1 = -(g + aty) + mu * (
                jnp.where(self.has_l, 1.0 / dl, 0.0)
                - jnp.where(self.has_u, 1.0 / du, 0.0)
            )
            return dict(
                f=f, g=g, r=r, jvals=jvals, hvals=hvals, dl=dl, du=du,
                r_d=r_d, comp_l=comp_l, comp_u=comp_u, sigma=sigma, r1=r1,
                theta=jnp.sum(jnp.abs(r)),
                phi=f - mu * (
                    jnp.sum(jnp.where(self.has_l, jnp.log(dl), 0.0))
                    + jnp.sum(jnp.where(self.has_u, jnp.log(du), 0.0))
                ),
            )

        self.resid = jax.jit(resid)
        self.objv = jax.jit(objv)
        self.gradv = jax.jit(gradv)
        self.barrier = jax.jit(barrier)
        self.theta = jax.jit(theta)
        self.evals = jax.jit(evals)
        self.trial_eval = jax.jit(lambda v, mu, th: (barrier(v, mu, th), theta(v, th)))

        def summary(ev, y, zl, zu, mu):
            """All per-iteration decision scalars as ONE stacked array so
            the host loop pays a single device round-trip (the sync-count
            discipline that makes the host loop usable through remote TPU
            tunnels): [dual_inf, prim_inf, comp@μ=0, comp@μ, Σ|y|+|z|,
            Σ|z|, f, θ, φ]."""
            a_l = jnp.where(self.has_l, ev["dl"] * zl, 0.0)
            a_u = jnp.where(self.has_u, ev["du"] * zu, 0.0)
            comp0 = jnp.maximum(
                jnp.max(jnp.abs(a_l), initial=0.0),
                jnp.max(jnp.abs(a_u), initial=0.0),
            )
            comp_mu = jnp.maximum(
                jnp.max(jnp.abs(ev["comp_l"]), initial=0.0),
                jnp.max(jnp.abs(ev["comp_u"]), initial=0.0),
            )
            zsum = jnp.sum(jnp.abs(zl)) + jnp.sum(jnp.abs(zu))
            return jnp.stack([
                jnp.max(jnp.abs(ev["r_d"]), initial=0.0),
                jnp.max(jnp.abs(ev["r"]), initial=0.0),
                comp0,
                comp_mu,
                jnp.sum(jnp.abs(y)) + zsum,
                zsum,
                ev["f"],
                ev["theta"],
                ev["phi"],
            ])

        self.summary = jax.jit(summary)

        def comp_at(ev, zl, zu, mu):
            a_l = jnp.where(self.has_l, ev["dl"] * zl - mu, 0.0)
            a_u = jnp.where(self.has_u, ev["du"] * zu - mu, 0.0)
            return jnp.maximum(
                jnp.max(jnp.abs(a_l), initial=0.0),
                jnp.max(jnp.abs(a_u), initial=0.0),
            )

        self.comp_at = jax.jit(comp_at)

        def ls_setup(v, dv, zl, dzl, zu, dzu, tau, g, dl, du, mu):
            """Fraction-to-boundary steps + barrier directional derivative
            in one fetch: [α_max, α_z, ∇φᵀd]."""
            ap, ad = alpha_fraction(v, dv, zl, dzl, zu, dzu, tau)
            gphi = (
                jnp.vdot(g, dv)
                - mu * jnp.sum(jnp.where(self.has_l, dv / dl, 0.0))
                + mu * jnp.sum(jnp.where(self.has_u, dv / du, 0.0))
            )
            return jnp.stack([ap, ad, gphi])

        self.ls_setup = jax.jit(ls_setup)

        hr = jnp.asarray(structure.hrows)
        hc = jnp.asarray(structure.hcols)

        def curvature(hvals, sigma, dw, dv):
            """dᵀ(W + Σ + δw I)d with W from the lower-tri COO."""
            dx = dv[:nx]
            coeff = jnp.where(hr == hc, 1.0, 2.0)
            quad = jnp.sum(coeff * hvals * dx[hr] * dx[hc])
            return quad + jnp.sum((sigma + dw) * dv * dv)

        self.curvature = jax.jit(curvature)

        def curv_check(hvals, sigma, dw, dv):
            """[dᵀKd, dᵀd, all-finite] in one fetch for the host loop."""
            return jnp.stack([
                curvature(hvals, sigma, dw, dv),
                jnp.vdot(dv, dv),
                jnp.isfinite(dv).all().astype(dv.dtype),
            ])

        self.curv_check = jax.jit(curv_check)

        def alpha_fraction(v, dv, zl, dzl, zu, dzu, tau):
            dl = jnp.where(self.has_l, v - self.l, 1.0)
            du = jnp.where(self.has_u, self.u - v, 1.0)
            a_l = jnp.where(self.has_l & (dv < 0), -tau * dl / jnp.where(dv < 0, dv, -1.0), 1.0)
            a_u = jnp.where(self.has_u & (dv > 0), tau * du / jnp.where(dv > 0, dv, 1.0), 1.0)
            alpha_p = jnp.minimum(1.0, jnp.minimum(jnp.min(a_l, initial=1.0), jnp.min(a_u, initial=1.0)))
            a_zl = jnp.where(self.has_l & (dzl < 0), -tau * zl / jnp.where(dzl < 0, dzl, -1.0), 1.0)
            a_zu = jnp.where(self.has_u & (dzu < 0), -tau * zu / jnp.where(dzu < 0, dzu, -1.0), 1.0)
            alpha_d = jnp.minimum(1.0, jnp.minimum(jnp.min(a_zl, initial=1.0), jnp.min(a_zu, initial=1.0)))
            return alpha_p, alpha_d

        self.alpha_fraction = jax.jit(alpha_fraction)


def madipm(model, options: Optional[IPMOptions] = None, *, theta=None,
           warm_start=None, **kwargs) -> IPMResult:
    """Solve an ExaModel-like NLP oracle to first-order stationarity.

    Returns IPMResult with primal x, constraint multipliers y (original,
    unscaled convention: ∇f + Jᵀy − zl + zu = 0 for minimization), and
    bound multipliers zl/zu over x.

    `warm_start`: an IPMResult (or dict with x/y/zl/zu) to resume from —
    used by the hybrid f32-bulk + f64-polish strategy (madipm_hybrid).
    """
    # private copy: option resolution below (delta_c_min floors, kwargs)
    # must not leak into the caller's object across solves
    opts = dataclasses.replace(options) if options is not None else IPMOptions()
    for k, v in kwargs.items():
        if not hasattr(opts, k):
            raise TypeError(f"unknown IPM option {k!r}")
        setattr(opts, k, v)

    t0 = time.time()
    if not getattr(model, "hess_coord_complete", True):
        raise ValueError(
            "model's hess_coord drops a curvature block (see build "
            "warnings): the direct KKT backends would silently converge to "
            "a wrong point. Restructure the oracle (embed_oracle) or keep "
            "nvar within the dense-triangle limit."
        )
    dtype = model.dtype if hasattr(model, "dtype") else jnp.float64
    structure = build_structure(model)
    nx, ns, m = structure.nx, structure.ns, structure.m
    n = nx + ns

    solver_kind = opts.linear_solver
    is_two_stage = getattr(model, "nscen", 1) > 1 and hasattr(model, "_var_scen")
    if solver_kind is None:
        if is_two_stage and n + m > opts.dense_limit:
            solver_kind = "schur"
        elif n + m <= opts.dense_limit:
            solver_kind = "dense"
        else:
            solver_kind = "blocktri"
    fdt = opts.factor_dtype
    if isinstance(fdt, str):
        fdt = jnp.dtype(fdt).type
    if fdt is not None and opts.delta_c_min == 0.0:
        opts.delta_c_min = 1e-5
    if solver_kind == "schur" and opts.delta_c_min == 0.0:
        # the scenario-Schur reduction sums S per-block contributions into
        # S00 = K00 + Σ G_s − Σ BᵀD⁻¹B; with Ipopt's δc = 1e-8·μ^0.25
        # schedule the AᵀA/δc terms reach ~1e10 and the S-fold summation
        # amplifies f64 cancellation until the PD certificate fails and δw
        # escalates (measured: 512-scenario AC-OPF stalls at E0 ≈ 9e-6 with
        # δw ≈ 1e-2; flooring δc solves it to 1e-6 in 19 iterations)
        opts.delta_c_min = 1e-7
    if opts.delta_c_min == 0.0 and jax.default_backend() == "tpu":
        # TPU f64 matmuls (cholesky/trisolve) are emulated with ~100x the
        # rounding error of IEEE f64; iterative refinement converges only
        # while eps_mm * cond(K) < 1 and cond(K) grows ~1/δc. Flooring δc
        # keeps IR contractive — without it dual infeasibility floors around
        # 3e-5 (measured, 4k/10k-bus AC-OPF) instead of reaching 1e-6.
        opts.delta_c_min = 1e-6
    if solver_kind == "schur":
        from .schur import ScenarioSchurKKT

        try:
            kkt = ScenarioSchurKKT(
                structure, model._var_scen, model._con_scen, model.nscen,
                dtype, mesh=opts.mesh,
            )
        except ValueError:
            if opts.linear_solver == "schur":
                raise  # explicit request: surface the structure problem
            kkt = (
                DenseKKT(structure, dtype)
                if n + m <= opts.dense_limit
                else CGKKT(structure, dtype)
            )
    elif solver_kind == "dense":
        kkt = DenseKKT(structure, dtype)
    elif solver_kind == "blocktri":
        from .blocktri import BlockTriKKT

        try:
            kkt = BlockTriKKT(structure, dtype, factor_dtype=fdt,
                                  cg_maxiter=opts.kkt_cg_maxiter,
                                  cg_accept=opts.kkt_cg_accept,
                                  hykkt_frac=opts.kkt_hykkt_frac,
                                  cg_inner_maxiter=opts.kkt_cg_inner_maxiter)
        except ValueError:  # bandwidth too large after RCM
            kkt = CGKKT(structure, dtype)
    elif solver_kind == "cg":
        kkt = CGKKT(structure, dtype)
    else:
        raise ValueError(f"unknown linear_solver {solver_kind!r}")

    F = _Funcs(model, structure, dtype, opts)
    theta_p = model.theta if theta is None else jnp.asarray(theta, dtype=dtype)

    # ---- bound relaxation (Ipopt bound_relax_factor) ---------------------
    lraw, uraw = F.lraw.copy(), F.uraw.copy()
    relax = opts.bound_relax_factor
    l_np = np.where(lraw > -_BIG, lraw - relax * np.maximum(1.0, np.abs(lraw)), lraw)
    u_np = np.where(uraw < _BIG, uraw + relax * np.maximum(1.0, np.abs(uraw)), uraw)
    F.l = jnp.asarray(np.where(l_np > -_BIG, l_np, 0.0), dtype=dtype)
    F.u = jnp.asarray(np.where(u_np < _BIG, u_np, 0.0), dtype=dtype)

    has_l = np.asarray(F.has_l)
    has_u = np.asarray(F.has_u)

    # ---- initial point ----------------------------------------------------
    if warm_start is not None:
        ws_x = np.asarray(warm_start["x"] if isinstance(warm_start, dict) else warm_start.x,
                          dtype=np.float64)
    else:
        ws_x = None
    x0 = ws_x if ws_x is not None else np.asarray(model.x0, dtype=np.float64)
    c0 = F.con_scale_np * np.asarray(model.cons(model.x0, theta=theta_p))
    s0 = c0[structure.ineq_rows] if ns else np.zeros(0)
    v = np.concatenate([x0, s0])
    for i in range(n):
        li, ui = l_np[i], u_np[i]
        if has_l[i] and has_u[i]:
            p = min(opts.kappa_1 * max(1.0, abs(li)), opts.kappa_2 * (ui - li))
            v[i] = min(max(v[i], li + p), ui - p)
        elif has_l[i]:
            v[i] = max(v[i], li + opts.kappa_1 * max(1.0, abs(li)))
        elif has_u[i]:
            v[i] = min(v[i], ui - opts.kappa_1 * max(1.0, abs(ui)))

    v = jnp.asarray(v, dtype=dtype)
    zl = jnp.where(F.has_l, 1.0, 0.0).astype(dtype)
    zu = jnp.where(F.has_u, 1.0, 0.0).astype(dtype)
    if warm_start is not None:
        ws = warm_start if isinstance(warm_start, dict) else dict(
            y=warm_start.y, zl=warm_start.zl, zu=warm_start.zu
        )
        # rescale original-convention multipliers into the scaled space
        if ws.get("zl") is not None:
            wzl = np.zeros(n)
            wzl[:nx] = F.obj_sign * np.asarray(ws["zl"]) * F.sigma_f
            zl = jnp.where(F.has_l, jnp.maximum(jnp.asarray(wzl, dtype=dtype), 1e-8), 0.0)
        if ws.get("zu") is not None:
            wzu = np.zeros(n)
            wzu[:nx] = F.obj_sign * np.asarray(ws["zu"]) * F.sigma_f
            zu = jnp.where(F.has_u, jnp.maximum(jnp.asarray(wzu, dtype=dtype), 1e-8), 0.0)

    # least-squares dual init: argmin ‖g − zl + zu + Aᵀy‖ via one KKT solve
    # with W = 0, Σ = 1 (Ipopt §3.6 analogue on the condensed system)
    y = jnp.zeros(m, dtype=dtype)
    if warm_start is not None and m:
        ws_y = warm_start["y"] if isinstance(warm_start, dict) else warm_start.y
        if ws_y is not None:
            y = F.obj_sign * jnp.asarray(np.asarray(ws_y), dtype=dtype) * F.sigma_f / F.con_scale
    elif m:
        ev0 = F.evals(v, y, zl, zu, opts.mu_init, theta_p)
        _, y_ls, ok_ls = kkt.solve(
            jnp.zeros_like(ev0["hvals"]), ev0["jvals"],
            jnp.ones(n, dtype=dtype), jnp.zeros(n, dtype=dtype),
            jnp.asarray(1.0, dtype=dtype),
            -(ev0["g"] - jnp.where(F.has_l, zl, 0.0) + jnp.where(F.has_u, zu, 0.0)),
            jnp.zeros(m, dtype=dtype),
        )
        if bool(ok_ls) and float(jnp.max(jnp.abs(y_ls), initial=0.0)) <= opts.y_init_max:
            y = y_ls

    mu = opts.mu_init
    tau = max(opts.tau_min, 1.0 - mu)
    mu_floor = opts.mu_min_factor * opts.tol

    filt: list[tuple[float, float]] = []
    theta_0 = float(F.theta(v, theta_p))
    theta_max = 1e4 * max(1.0, theta_0)
    theta_min = 1e-4 * max(1.0, theta_0)
    filt.append((theta_max, -np.inf))

    delta_w_last = 0.0
    status = "max_iter"
    it = 0
    n_acceptable = 0
    n_bound = int(has_l.sum() + has_u.sum())

    def kkt_error(ev, y, zl, zu):
        sd = max(opts.s_max,
                 (float(jnp.sum(jnp.abs(y))) + float(jnp.sum(jnp.abs(zl))) + float(jnp.sum(jnp.abs(zu))))
                 / max(1, m + n_bound)) / opts.s_max
        sc = max(opts.s_max,
                 (float(jnp.sum(jnp.abs(zl))) + float(jnp.sum(jnp.abs(zu)))) / max(1, n_bound)) / opts.s_max
        dual_inf = float(jnp.max(jnp.abs(ev["r_d"]), initial=0.0))
        prim_inf = float(jnp.max(jnp.abs(ev["r"]), initial=0.0))
        comp = max(float(jnp.max(jnp.abs(ev["comp_l"]), initial=0.0)),
                   float(jnp.max(jnp.abs(ev["comp_u"]), initial=0.0)))
        return max(dual_inf / sd, prim_inf, comp / sc), dual_inf, prim_inf, comp

    for it in range(opts.max_iter):
        if time.time() - t0 > opts.max_wall_time:
            status = "time_limit"
            break
        ev = F.evals(v, y, zl, zu, mu, theta_p)
        if not bool(jnp.isfinite(ev["f"])) or not bool(jnp.isfinite(ev["theta"])):
            status = "diverged"
            break

        # one fused scalar fetch per iteration (sync discipline: the host
        # loop must stay usable over remote-TPU tunnels)
        (dual_inf, prim_inf, comp0, comp_mu, ysum, zsum, f_cur, theta_cur,
         phi_cur) = (float(t) for t in np.asarray(
            F.summary(ev, y, zl, zu, mu)))
        sd = max(opts.s_max, ysum / max(1, m + n_bound)) / opts.s_max
        sc = max(opts.s_max, zsum / max(1, n_bound)) / opts.s_max
        E0 = max(dual_inf / sd, prim_inf, comp0 / sc)
        comp = comp0
        if opts.verbose:
            print(f"it {it:4d}  f {f_cur:+.8e}  θ {theta_cur:.2e} "
                  f"E0 {E0:.2e}  μ {mu:.1e}  δw {delta_w_last:.1e}  "
                  f"[d {dual_inf / sd:.1e} p {prim_inf:.1e} "
                  f"c {comp0 / sc:.1e} sd {sd:.1e}]")
        if E0 <= opts.tol:
            status = "first_order"
            break
        if E0 <= opts.acceptable_tol:
            n_acceptable += 1
            if n_acceptable >= opts.acceptable_iter:
                status = "acceptable"
                break
        else:
            n_acceptable = 0

        # barrier update (Fiacco-McCormick, may cascade)
        E_mu = max(dual_inf / sd, prim_inf, comp_mu / sc)
        mu_old = mu
        while mu > mu_floor and E_mu <= opts.kappa_eps * mu:
            mu = max(mu_floor, min(opts.kappa_mu * mu, mu ** opts.theta_mu))
            tau = max(opts.tau_min, 1.0 - mu)
            filt = [(theta_max, -np.inf)]
            E_mu = max(dual_inf / sd, prim_inf,
                       float(F.comp_at(ev, zl, zu, mu)) / sc)
        if mu != mu_old:
            ev = F.evals(v, y, zl, zu, mu, theta_p)
            phi_cur = None  # refreshed below

        # ---- KKT solve + inertia-free curvature correction ----------------
        dc = max(opts.delta_c_bar * max(mu ** opts.kappa_c, 1e-10), opts.delta_c_min)
        delta_w = 0.0
        trial_w = (opts.delta_w0 if delta_w_last == 0.0
                   else max(opts.delta_w_min, opts.kappa_w_minus * delta_w_last))
        # With an inertia-certifying backend (dense/blocktri-f64/schur
        # Cholesky), SPD of the condensed matrix IS the correct-inertia
        # condition, so the conservative dᵀ(W+Σ+δw)d curvature test is
        # skipped — it spuriously triggers δw > 0 near solutions of
        # equality-constrained problems, flooring the attainable dual
        # infeasibility (observed stalling at E0 ≈ 1e-4 on 10k-bus AC-OPF).
        certified = getattr(kkt, "certifies_inertia", False)
        dv = dy = None
        for _attempt in range(60):
            dv, dy, pd_ok = kkt.solve(
                ev["hvals"], ev["jvals"], ev["sigma"],
                jnp.full(n, delta_w, dtype=dtype), jnp.asarray(dc, dtype=dtype),
                ev["r1"], -ev["r"],
            )
            if certified:
                cchk = F.curv_check(
                    ev["hvals"], ev["sigma"], jnp.asarray(delta_w, dtype), dv
                )
                pd_np, cchk_np = jax.device_get((pd_ok, cchk))
                if bool(pd_np) and cchk_np[2] > 0:  # SPD + finite direction
                    break
            else:
                cchk = F.curv_check(
                    ev["hvals"], ev["sigma"], jnp.asarray(delta_w, dtype), dv
                )
                pd_np, cchk_np = jax.device_get((pd_ok, cchk))  # one round trip
                if bool(pd_np) and cchk_np[2] > 0:
                    curv, dnorm = float(cchk_np[0]), float(cchk_np[1])
                    if curv >= opts.curvature_kappa * dnorm:
                        break
            kwp = (opts.kappa_w_plus_bar if delta_w_last == 0.0
                   else opts.kappa_w_plus)
            delta_w = trial_w if delta_w == 0.0 else delta_w * kwp
            if delta_w > opts.delta_w_max:
                status = "kkt_failure"
                break
        else:
            status = "kkt_failure"
        if status == "kkt_failure":
            break
        delta_w_last = delta_w if delta_w > 0 else delta_w_last

        # dual direction for bounds
        dl, du = ev["dl"], ev["du"]
        dzl = jnp.where(F.has_l, mu / dl - zl - zl * dv / dl, 0.0)
        dzu = jnp.where(F.has_u, mu / du - zu + zu * dv / du, 0.0)

        # ---- filter line search ------------------------------------------
        lss = np.asarray(
            F.ls_setup(v, dv, zl, dzl, zu, dzu, tau, ev["g"], dl, du, mu)
        )
        alpha_max, alpha_z, gphi_dv = float(lss[0]), float(lss[1]), float(lss[2])
        if phi_cur is None:  # μ changed this iteration; refresh θ/φ
            phi_cur, theta_cur = (float(t) for t in F.trial_eval(v, mu, theta_p))

        if gphi_dv < 0 and theta_cur <= theta_min:
            alpha_min = opts.alpha_min_frac * min(
                opts.gamma_theta,
                opts.gamma_phi * theta_cur / max(-gphi_dv, 1e-300),
                opts.delta * theta_cur ** opts.s_theta / max((-gphi_dv) ** opts.s_phi, 1e-300),
            )
        elif gphi_dv < 0:
            alpha_min = opts.alpha_min_frac * min(
                opts.gamma_theta,
                opts.gamma_phi * theta_cur / max(-gphi_dv, 1e-300),
            )
        else:
            alpha_min = opts.alpha_min_frac * opts.gamma_theta
        alpha_min = max(alpha_min, 1e-16)

        accepted = False
        f_type_step = False
        alpha = alpha_max
        soc_applied = False
        for _ls in range(opts.max_ls):
            v_t = v + alpha * dv
            phi_t, theta_t = F.trial_eval(v_t, mu, theta_p)
            phi_t, theta_t = float(phi_t), float(theta_t)

            acceptable_filter = all(
                theta_t <= (1 - opts.gamma_theta) * th or phi_t <= ph - opts.gamma_phi * th
                for th, ph in filt
            ) and theta_t < theta_max

            switching = (
                gphi_dv < 0
                and alpha * (-gphi_dv) ** opts.s_phi > opts.delta * theta_cur ** opts.s_theta
                and theta_cur <= theta_min
            )
            if switching:
                armijo = phi_t <= phi_cur + opts.eta_phi * alpha * gphi_dv
                if acceptable_filter and armijo:
                    accepted, f_type_step = True, True
                    break
            else:
                suff = (theta_t <= (1 - opts.gamma_theta) * theta_cur
                        or phi_t <= phi_cur - opts.gamma_phi * theta_cur)
                if acceptable_filter and suff:
                    accepted = True
                    break

            # second-order correction on the first rejected full step
            if (not soc_applied and _ls == 0 and alpha >= alpha_max * 0.999
                    and theta_t >= theta_cur and m > 0):
                soc_applied = True
                r_soc = ev["r"]
                v_soc = v_t
                for _soc in range(opts.max_soc):
                    r_new = F.resid(v_soc, theta_p)
                    r_soc = alpha * r_soc + r_new
                    dv_c, dy_c, ok_c = kkt.solve(
                        ev["hvals"], ev["jvals"], ev["sigma"],
                        jnp.full(n, delta_w, dtype=dtype), jnp.asarray(dc, dtype=dtype),
                        ev["r1"], -r_soc,
                    )
                    if not bool(ok_c):
                        break
                    a_soc, _ = F.alpha_fraction(v, dv_c, zl, dzl, zu, dzu, tau)
                    v_try = v + float(a_soc) * dv_c
                    phi_s, theta_s = F.trial_eval(v_try, mu, theta_p)
                    phi_s, theta_s = float(phi_s), float(theta_s)
                    ok_filter = all(
                        theta_s <= (1 - opts.gamma_theta) * th or phi_s <= ph - opts.gamma_phi * th
                        for th, ph in filt
                    ) and theta_s < theta_max
                    suff_s = (theta_s <= (1 - opts.gamma_theta) * theta_cur
                              or phi_s <= phi_cur - opts.gamma_phi * theta_cur)
                    if ok_filter and suff_s:
                        v_t, dv = v_try, dv_c
                        dy = dy_c
                        alpha = float(a_soc)
                        accepted = True
                        break
                    if theta_s > opts.kappa_soc * float(jnp.sum(jnp.abs(r_soc))):
                        break
                    v_soc = v_try
                if accepted:
                    break

            alpha *= 0.5
            if alpha < alpha_min:
                break

        if not accepted:
            v_r, ok = _restoration(F, kkt, v, mu, theta_p, opts, dtype, n)
            if not ok:
                status = "restoration_failure"
                break
            v = v_r
            dl = jnp.where(F.has_l, v - F.l, 1.0)
            du = jnp.where(F.has_u, F.u - v, 1.0)
            zl = jnp.where(F.has_l, jnp.clip(mu / dl, 1e-8, 1e8), 0.0)
            zu = jnp.where(F.has_u, jnp.clip(mu / du, 1e-8, 1e8), 0.0)
            filt.append(((1 - opts.gamma_theta) * theta_cur,
                         phi_cur - opts.gamma_phi * theta_cur))
            continue

        if not f_type_step:
            filt.append(((1 - opts.gamma_theta) * theta_cur,
                         phi_cur - opts.gamma_phi * theta_cur))

        v = v + alpha * dv
        y = y + alpha * dy
        zl = zl + alpha_z * dzl
        zu = zu + alpha_z * dzu

        # dual safeguard (Ipopt eq. 16)
        dl = jnp.where(F.has_l, v - F.l, 1.0)
        du = jnp.where(F.has_u, F.u - v, 1.0)
        zl = jnp.where(F.has_l,
                       jnp.clip(zl, mu / (opts.kappa_sigma * dl), opts.kappa_sigma * mu / dl),
                       0.0)
        zu = jnp.where(F.has_u,
                       jnp.clip(zu, mu / (opts.kappa_sigma * du), opts.kappa_sigma * mu / du),
                       0.0)

    ev0 = F.evals(v, y, zl, zu, 0.0, theta_p)
    E0, dual_inf, prim_inf, comp = kkt_error(ev0, y, zl, zu)
    if status not in ("first_order", "acceptable"):
        if E0 <= opts.tol:
            status = "first_order"
        elif E0 <= opts.acceptable_tol:
            status = "acceptable"

    # unscale multipliers back to the original problem convention
    sign = 1.0 if model.minimize else -1.0
    unscale = F.con_scale / F.sigma_f
    return IPMResult(
        x=v[:nx],
        y=sign * unscale * y,
        zl=sign * zl[:nx] / F.sigma_f,
        zu=sign * zu[:nx] / F.sigma_f,
        status=status,
        objective=float(model.obj(v[:nx], theta=theta_p)),
        iterations=it + 1,
        primal_infeasibility=prim_inf,
        dual_infeasibility=dual_inf,
        complementarity=comp,
        wall_time=time.time() - t0,
        mu=mu,
    )


def _restoration(F, kkt, v, mu, theta_p, opts, dtype, n):
    """Minimal feasibility restoration: damped Gauss-Newton on ½‖r(v)‖²
    keeping iterates interior, reusing the KKT backend with J as the only
    curvature (W=0). Returns (v_new, success)."""
    v_r = v
    theta_prev = float(F.theta(v_r, theta_p))
    for _ in range(30):
        r = F.resid(v_r, theta_p)
        th = float(jnp.sum(jnp.abs(r)))
        if th <= max(1e-12, 1e-4 * theta_prev):
            return v_r, True
        x = v_r[: F.s.nx]
        jvals = F.jcoo_scale * F.model._jac_impl(F.model._static, x, theta_p)
        sigma = jnp.full(n, 1.0, dtype=dtype)  # proximal weight
        dv, _dy, ok = kkt.solve(
            jnp.zeros(len(F.s.hrows), dtype=dtype), jvals, sigma,
            jnp.zeros(n, dtype=dtype), jnp.asarray(1.0, dtype=dtype),
            jnp.zeros(n, dtype=dtype), -r
        )
        if not bool(ok) or not bool(jnp.isfinite(dv).all()):
            return v_r, False
        zl0 = jnp.zeros(n, dtype=dtype)
        a, _ = F.alpha_fraction(v_r, dv, zl0, zl0, zl0, zl0, 0.99)
        a = float(a)
        improved = False
        for _ls in range(20):
            v_t = v_r + a * dv
            th_t = float(F.theta(v_t, theta_p))
            if th_t < th * (1 - 1e-4 * a):
                v_r, improved = v_t, True
                break
            a *= 0.5
        if not improved:
            return v_r, th < theta_prev * 0.9
    return v_r, True
