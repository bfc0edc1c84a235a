"""Fully on-device interior-point solver: the entire filter line-search
iteration — oracle evaluation, KKT factorization with inertia-free
regularization, fraction-to-boundary, filter line search, barrier updates —
is ONE compiled XLA program (`lax.while_loop`), so solving costs a single
device dispatch. This is the TPU-native counterpart of the host-driven
`madipm` (ipm.py), which keeps Python control flow for its feasibility
restoration and second-order correction; `madipm_device` trades those
rarely-taken branches for zero per-iteration host synchronization
(the "IPM iters/sec" path of BASELINE.json).

Algorithm per iteration (Wächter–Biegler, as in ipm.py):
  evals → termination test → Fiacco-McCormick μ cascade (closed-form comp
  update) → blocktri/dense KKT solve inside a bounded δw while_loop with the
  curvature test → dual directions → fraction-to-boundary → backtracking
  filter line search (fixed-size device filter, masked vector compare) →
  state update + dual safeguard.

Falls back: returns status "stalled" when the line search cannot accept;
callers needing restoration re-solve with the host IPM.
"""

from __future__ import annotations

import dataclasses
import time
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ipm import IPMOptions, IPMResult, _Funcs, _BIG
from .kkt import DenseKKT, build_structure

_RUNNING, _FIRST_ORDER, _ACCEPTABLE, _STALLED, _MAXITER, _DIVERGED = range(6)
_STATUS_NAMES = {
    _FIRST_ORDER: "first_order",
    _ACCEPTABLE: "acceptable",
    _STALLED: "stalled",
    _MAXITER: "max_iter",
    _DIVERGED: "diverged",
}
_NFILT = 64


def _mesh_key(mesh):
    """Stable cache-key component for an options mesh. `id(mesh)` is unsafe
    (CPython reuses ids after GC → possible stale compiled-loop hit; and two
    equal-but-distinct meshes would each pay the full compile). Key on the
    mesh's shape + axis names instead."""
    if mesh is None:
        return None
    try:
        return (tuple(sorted(mesh.shape.items())), tuple(mesh.axis_names))
    except AttributeError:  # non-Mesh object: fall back to identity
        return id(mesh)


def madipm_device(model, options: Optional[IPMOptions] = None, *, theta=None,
                  **kwargs) -> IPMResult:
    # private copy: resolved floors (delta_c_min) stay local to this solve
    opts = dataclasses.replace(options) if options is not None else IPMOptions()
    for k, v in kwargs.items():
        if not hasattr(opts, k):
            raise TypeError(f"unknown IPM option {k!r}")
        setattr(opts, k, v)

    t0 = time.time()
    if not getattr(model, "hess_coord_complete", True):
        raise ValueError(
            "model's hess_coord drops a curvature block (see build "
            "warnings): the direct KKT backends would silently converge "
            "to a wrong point."
        )
    dtype = model.dtype if hasattr(model, "dtype") else jnp.float64

    # Every numeric option is fed to the compiled loop as a TRACED scalar
    # (see _build_loop), so ONE compiled program per (model structure, KKT
    # backend, dtype) serves every tol/μ/iteration-budget configuration —
    # in-process via this cache and across processes via the persistent XLA
    # cache, whose hash no longer depends on option values. At 10k-bus the
    # loop program is ~10-30 min of cold (remote-tunnel) compile: paying it
    # once total instead of once per option set is the difference between
    # a usable and an unusable solver bench.
    structure_early = None
    solver_kind = opts.linear_solver
    is_arrowhead = getattr(model, "nscen", 1) > 1 and hasattr(model, "_var_scen")
    if solver_kind is None:
        structure_early = build_structure(model)
        n_guess = structure_early.nx + structure_early.ns + structure_early.m
        if is_arrowhead and n_guess > opts.dense_limit:
            solver_kind = "schur"  # same auto rule as madipm (ipm.py)
        else:
            solver_kind = "dense" if n_guess <= opts.dense_limit else "blocktri"
    fdt = opts.factor_dtype
    if isinstance(fdt, str):
        fdt = jnp.dtype(fdt).type
    if solver_kind == "schur" and fdt is not None and \
            jnp.dtype(fdt) != jnp.dtype(dtype):
        raise ValueError(
            "the schur backend factors in the working dtype only; "
            "unset factor_dtype (madipm_hybrid's f32 bulk loop is "
            "blocktri/dense-specific)"
        )
    # resolved dual-regularization floor (local: never mutate user opts)
    delta_c_min = opts.delta_c_min
    if fdt is not None and delta_c_min == 0.0:
        delta_c_min = 1e-5
    if solver_kind == "schur" and delta_c_min == 0.0:
        delta_c_min = 1e-7  # S-fold Schur summation cancellation (ipm.py)
    if delta_c_min == 0.0 and jax.default_backend() == "tpu":
        # see ipm.py: TPU-emulated f64 matmul error x cond(K) must stay
        # inside the iterative-refinement contraction region
        delta_c_min = 1e-6

    struct_key = (
        solver_kind,
        None if fdt is None else jnp.dtype(fdt).name,
        opts.scaling,
        opts.scaling_max_gradient,
        opts.bound_relax_factor,  # baked into F.l/F.u closed over by evals
        opts.kkt_cg_maxiter,  # baked into the blocktri PCG while_loop
        opts.kkt_cg_accept,
        opts.kkt_hykkt_frac,  # selects the mixed-path dual recovery program
        opts.kkt_cg_inner_maxiter,
        _mesh_key(opts.mesh),
    )
    cache = model.__dict__.setdefault("_ipm_device_cache", {})
    cached = cache.get(struct_key)

    structure = (
        cached["structure"]
        if cached is not None
        else (structure_early or build_structure(model))
    )
    nx, ns, m = structure.nx, structure.ns, structure.m
    n = nx + ns

    if cached is not None:
        kkt = cached["kkt"]
        F = cached["F"]
    else:
        if solver_kind == "schur":
            from .schur import ScenarioSchurKKT

            kkt = ScenarioSchurKKT(
                structure, model._var_scen, model._con_scen, model.nscen,
                dtype, mesh=opts.mesh,
            )
        elif solver_kind == "blocktri":
            from .blocktri import BlockTriKKT

            try:
                kkt = BlockTriKKT(structure, dtype, factor_dtype=fdt,
                                  cg_maxiter=opts.kkt_cg_maxiter,
                                  cg_accept=opts.kkt_cg_accept,
                                  hykkt_frac=opts.kkt_hykkt_frac,
                                  cg_inner_maxiter=opts.kkt_cg_inner_maxiter)
            except ValueError:  # bandwidth too large after RCM (same
                from .kkt import CGKKT  # fallback as madipm, ipm.py:404-407)

                kkt = CGKKT(structure, dtype)
        elif solver_kind == "cg":
            from .kkt import CGKKT

            kkt = CGKKT(structure, dtype)
        else:
            kkt = DenseKKT(structure, dtype)
        if hasattr(kkt, "report_stats"):
            # device loop accounts Krylov work (backsolve counts) in its
            # carried state — the per-iteration cost breakdown the bench
            # and profiler report
            kkt.report_stats = True
        F = _Funcs(model, structure, dtype, opts)
    theta_p = model.theta if theta is None else jnp.asarray(theta, dtype=dtype)

    # bound relaxation (same as host path)
    lraw, uraw = F.lraw.copy(), F.uraw.copy()
    relax = opts.bound_relax_factor
    l_np = np.where(lraw > -_BIG, lraw - relax * np.maximum(1.0, np.abs(lraw)), lraw)
    u_np = np.where(uraw < _BIG, uraw + relax * np.maximum(1.0, np.abs(uraw)), uraw)
    F.l = jnp.asarray(np.where(l_np > -_BIG, l_np, 0.0), dtype=dtype)
    F.u = jnp.asarray(np.where(u_np < _BIG, u_np, 0.0), dtype=dtype)
    has_l, has_u = np.asarray(F.has_l), np.asarray(F.has_u)

    # initial point
    x0 = np.asarray(model.x0, dtype=np.float64)
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
    y = jnp.zeros(m, dtype=dtype)
    if m:
        ev0 = F.evals(v, y, zl, zu, opts.mu_init, theta_p)
        out_ls = kkt.solve(
            jnp.zeros_like(ev0["hvals"]), ev0["jvals"],
            jnp.ones(n, dtype=dtype), jnp.zeros(n, dtype=dtype),
            jnp.asarray(1.0, dtype=dtype),
            -(ev0["g"] - jnp.where(F.has_l, zl, 0.0) + jnp.where(F.has_u, zu, 0.0)),
            jnp.zeros(m, dtype=dtype),
        )
        y_ls, ok_ls = out_ls[1], out_ls[2]
        if bool(ok_ls) and float(jnp.max(jnp.abs(y_ls), initial=0.0)) <= opts.y_init_max:
            y = y_ls

    theta_0 = float(F.theta(v, theta_p))
    theta_max = 1e4 * max(1.0, theta_0)
    theta_min = 1e-4 * max(1.0, theta_0)
    n_bound = int(has_l.sum() + has_u.sum())
    mu_floor = opts.mu_min_factor * opts.tol

    P = _pack_options(opts, dtype, delta_c_min=delta_c_min,
                      theta_max=theta_max, theta_min=theta_min,
                      mu_floor=mu_floor)
    st = _init_state(v, y, zl, zu, theta_p, P, dtype)
    if cached is not None:
        solve_loop = cached["loop"]
        loop_compile_s = 0.0  # in-process cache hit: no compile paid
    else:
        # AOT-compile the loop explicitly (instead of letting the first call
        # trigger it) so compile time is a first-class, separately-reported
        # number — it lands in IPMResult.detail["loop_compile_s"] and in the
        # bench metric string. With a warm persistent XLA cache this is a
        # fast executable deserialization; cold it is the dominant cost.
        run_fn = _build_loop(F, kkt, dtype, n, m, n_bound)
        tc = time.time()
        solve_loop = run_fn.lower(st, P).compile()
        loop_compile_s = time.time() - tc
        cache[struct_key] = dict(
            structure=structure, kkt=kkt, F=F, loop=solve_loop
        )

    # ---- chunked dispatch ---------------------------------------------
    # The while_loop runs at most (chunk_stop - it) iterations per device
    # dispatch; the host re-dispatches from the carried state until the
    # loop terminates. Rationale: a single dispatch exceeding ~60s kills
    # this machine's TPU worker outright ("kernel fault" — measured with a
    # trivial matmul fori_loop: 42s survives, 60s crashes), and any
    # production runtime has similar watchdogs. chunk_stop is a traced
    # scalar in P, so chunk-size changes NEVER recompile; the only
    # per-chunk cost is one scalar readback (~ms) against a multi-second
    # dispatch. device_dispatch_budget_s=inf restores one-shot dispatch.
    budget = opts.device_dispatch_budget_s
    chunk = opts.device_chunk_iters
    one_shot = chunk <= 0 and not np.isfinite(budget)
    if chunk <= 0:
        chunk = opts.max_iter if one_shot else 4
    n_dispatch = 0
    loop_exec_s = 0.0  # pure dispatch wall (no compile, no pre-loop work)
    per_it_max = 0.0  # worst observed per-iteration wall across chunks
    hit_wall = False
    while True:
        # honor an explicit positive device_chunk_iters even with an inf
        # budget (the two knobs are documented as independent; advisor r4)
        stop = opts.max_iter if one_shot else \
            min(int(st["it"]) + chunk, opts.max_iter)
        P["chunk_stop"] = jnp.asarray(stop, jnp.int32)
        td = time.time()
        st = solve_loop(st, P)
        status_i, it_i = int(st["status"]), int(st["it"])  # sync + readback
        wall_d = time.time() - td
        loop_exec_s += wall_d
        n_dispatch += 1
        if opts.verbose:
            print(
                f"[madipm_device] chunk {n_dispatch}: it={it_i} "
                f"status={status_i} wall={wall_d:.1f}s "
                f"trips={int(st['kkt_trips'])} "
                f"backsolves={int(st['kkt_backsolves'])} "
                f"prim={float(st['prim_inf']):.1e} "
                f"dual={float(st['dual_inf']):.1e} "
                f"mu={float(st['mu']):.1e}",
                flush=True,
            )
        if status_i != _RUNNING or it_i >= opts.max_iter:
            break
        if loop_exec_s >= opts.device_max_wall_s:
            hit_wall = True  # return the carried state as-is ("max_wall")
            break
        if opts.device_chunk_iters <= 0 and np.isfinite(budget):
            # adaptive: aim each dispatch at ~budget seconds. Plan from the
            # MAX observed per-iteration wall, not the latest average —
            # per-iteration cost is non-stationary (tail-conditioning
            # Krylov iterations cost multiples of early ones) and a chunk
            # planned from a cheap phase can overrun the ~60s watchdog
            # (advisor r4). Growth stays capped at 8x per step.
            per_it_max = max(per_it_max, wall_d / chunk, 1e-4)
            chunk = int(max(1, min(budget / per_it_max, chunk * 8)))
    out = jax.device_get(st)
    v, y, zl, zu = (jnp.asarray(out[k]) for k in ("v", "y", "zl", "zu"))
    status = (
        "max_wall" if hit_wall and int(out["status"]) == _RUNNING
        else _STATUS_NAMES.get(int(out["status"]), "unknown")
    )

    sign = 1.0 if model.minimize else -1.0
    unscale = F.con_scale / F.sigma_f
    return IPMResult(
        x=v[:nx],
        y=sign * unscale * y,
        zl=sign * zl[:nx] / F.sigma_f,
        zu=sign * zu[:nx] / F.sigma_f,
        status=status,
        objective=float(model.obj(v[:nx], theta=theta_p)),
        iterations=int(out["it"]),
        primal_infeasibility=float(out["prim_inf"]),
        dual_infeasibility=float(out["dual_inf"]),
        complementarity=float(out["comp"]),
        wall_time=time.time() - t0,
        mu=float(out["mu"]),
        detail=dict(loop_compile_s=loop_compile_s, n_dispatch=n_dispatch,
                    loop_exec_s=loop_exec_s,
                    dw_last=float(out["dw_last"]),
                    kkt_trips=int(out["kkt_trips"]),
                    kkt_backsolves=int(out["kkt_backsolves"])),
    )


_P_FLOAT = (
    "tol", "acceptable_tol", "s_max", "kappa_eps", "kappa_mu", "theta_mu",
    "tau_min", "mu_init", "delta_c_bar", "kappa_c", "delta_w0",
    "delta_w_min", "kappa_w_minus", "kappa_w_plus", "kappa_w_plus_bar",
    "curvature_kappa",
    "alpha_min_frac", "gamma_theta", "gamma_phi", "delta", "s_theta",
    "s_phi", "eta_phi", "kappa_sigma",
)
_P_INT = ("acceptable_iter", "max_iter", "max_ls")


def _pack_options(opts: IPMOptions, dtype, *, delta_c_min, theta_max,
                  theta_min, mu_floor) -> dict:
    """Numeric IPM options as device scalars — the traced `P` argument of
    the compiled loop. Includes the resolved dual-regularization floor and
    the initial-point-dependent theta_max/theta_min/mu_floor (previously
    baked constants, which went stale when a cached loop was reused from a
    different starting point)."""
    P = {k: jnp.asarray(getattr(opts, k), dtype) for k in _P_FLOAT}
    P.update({k: jnp.asarray(getattr(opts, k), jnp.int32) for k in _P_INT})
    P["delta_c_min"] = jnp.asarray(delta_c_min, dtype)
    P["theta_max"] = jnp.asarray(theta_max, dtype)
    P["theta_min"] = jnp.asarray(theta_min, dtype)
    P["mu_floor"] = jnp.asarray(mu_floor, dtype)
    # absolute iteration index at which the CURRENT dispatch must return
    # (chunked dispatch, see madipm_device); overwritten per chunk
    P["chunk_stop"] = jnp.asarray(opts.max_iter, jnp.int32)
    return P


def _init_state(v, y, zl, zu, theta_p, P, dtype):
    """Full solver carry as a host-built pytree: the compiled loop both
    takes and returns this state, so a solve can span several bounded
    dispatches (and could be checkpointed/resumed across processes)."""
    big = jnp.asarray(1e30, dtype)
    return dict(
        v=v, y=y, zl=zl, zu=zu,
        mu=jnp.asarray(P["mu_init"], dtype),
        tau=jnp.maximum(P["tau_min"], 1.0 - P["mu_init"]).astype(dtype),
        dw_last=jnp.asarray(0.0, dtype),
        fails=jnp.asarray(0, jnp.int32),
        filt_th=jnp.full(_NFILT, big, dtype=dtype),
        filt_ph=jnp.full(_NFILT, -big, dtype=dtype),
        nfilt=jnp.asarray(0, jnp.int32),
        it=jnp.asarray(0, jnp.int32),
        status=jnp.asarray(_RUNNING, jnp.int32),
        n_acc=jnp.asarray(0, jnp.int32),
        prim_inf=jnp.asarray(jnp.inf, dtype),
        dual_inf=jnp.asarray(jnp.inf, dtype),
        comp=jnp.asarray(jnp.inf, dtype),
        theta_p=theta_p,
        # Krylov-work accounting: total δw-loop KKT attempts and total
        # backsolves (inner-PCG + outer-CG iterations) across the solve
        kkt_trips=jnp.asarray(0, jnp.int32),
        kkt_backsolves=jnp.asarray(0, jnp.int32),
    )


def _build_loop(F, kkt, dtype, n, m, n_bound):
    """Compile the full IPM as one jitted while_loop program.

    Every numeric option arrives as a traced scalar in `P` (see
    _pack_options), NOT as a baked Python constant: the compiled
    program depends only on the model structure + KKT backend, so
    tol/mu/iteration-budget changes never retrace or recompile (and
    the persistent XLA-cache key is option-independent). The program
    maps state -> state and returns as soon as `it` reaches
    P["chunk_stop"], enabling watchdog-bounded chunked dispatch.
    """

    @jax.jit
    def run(st_in, P):
        big = jnp.asarray(1e30, dtype)

        def kkt_error_parts(ev, y, zl, zu):
            sd = jnp.maximum(
                P["s_max"],
                (jnp.sum(jnp.abs(y)) + jnp.sum(jnp.abs(zl)) + jnp.sum(jnp.abs(zu)))
                / max(1, m + n_bound),
            ) / P["s_max"]
            sc = jnp.maximum(
                P["s_max"],
                (jnp.sum(jnp.abs(zl)) + jnp.sum(jnp.abs(zu))) / max(1, n_bound),
            ) / P["s_max"]
            dual_inf = jnp.max(jnp.abs(ev["r_d"]), initial=0.0)
            prim_inf = jnp.max(jnp.abs(ev["r"]), initial=0.0)
            comp = jnp.maximum(
                jnp.max(jnp.abs(ev["comp_l"]), initial=0.0),
                jnp.max(jnp.abs(ev["comp_u"]), initial=0.0),
            )
            return sd, sc, dual_inf, prim_inf, comp

        def body(st):
            v, y, zl, zu = st["v"], st["y"], st["zl"], st["zu"]
            mu, tau = st["mu"], st["tau"]

            ev = F.evals(v, y, zl, zu, mu, st["theta_p"])
            sd, sc, dual_inf, prim_inf, comp0 = kkt_error_parts(ev, y, zl, zu)
            # μ-independent error: comp with μ = 0 is |dl·zl|, |du·zu|
            a_l = jnp.where(F.has_l, ev["dl"] * zl, 0.0)
            a_u = jnp.where(F.has_u, ev["du"] * zu, 0.0)
            comp00 = jnp.maximum(
                jnp.max(jnp.abs(a_l), initial=0.0), jnp.max(jnp.abs(a_u), initial=0.0)
            )
            E0 = jnp.maximum(dual_inf / sd, jnp.maximum(prim_inf, comp00 / sc))

            finite = jnp.isfinite(ev["f"]) & jnp.isfinite(ev["theta"])
            status = jnp.where(~finite, _DIVERGED, st["status"])
            status = jnp.where(finite & (E0 <= P["tol"]), _FIRST_ORDER, status)
            n_acc = jnp.where(
                E0 <= P["acceptable_tol"], st["n_acc"] + 1, jnp.zeros_like(st["n_acc"])
            )
            status = jnp.where(
                (status == _RUNNING) & (n_acc >= P["acceptable_iter"]),
                _ACCEPTABLE,
                status,
            )

            # ---- Fiacco-McCormick cascade (closed-form comp(μ)) --------------
            def mu_err(mu_):
                cl = jnp.max(jnp.abs(a_l - jnp.where(F.has_l, mu_, 0.0)), initial=0.0)
                cu = jnp.max(jnp.abs(a_u - jnp.where(F.has_u, mu_, 0.0)), initial=0.0)
                return jnp.maximum(dual_inf / sd, jnp.maximum(prim_inf, jnp.maximum(cl, cu) / sc))

            def mu_step(_, mu_):
                upd = (mu_ > P["mu_floor"]) & (mu_err(mu_) <= P["kappa_eps"] * mu_)
                new = jnp.maximum(P["mu_floor"], jnp.minimum(P["kappa_mu"] * mu_, mu_ ** P["theta_mu"]))
                return jnp.where(upd, new, mu_)

            mu_new = jax.lax.fori_loop(0, 8, mu_step, mu)
            mu_changed = mu_new != mu
            # filter reset on μ change
            filt_th = jnp.where(mu_changed, jnp.full(_NFILT, big), st["filt_th"])
            filt_ph = jnp.where(mu_changed, jnp.full(_NFILT, -big), st["filt_ph"])
            nfilt = jnp.where(mu_changed, 0, st["nfilt"])
            # update the μ-dependent quantities in closed form (avoids a second
            # full oracle evaluation in the traced program): with
            # binv = 1/dl − 1/du (masked) and logsum = (f − φ)/μ,
            #   r1(μ') = r1(μ) + (μ' − μ)·binv,  φ(μ') = f − μ'·logsum
            binv = jnp.where(F.has_l, 1.0 / ev["dl"], 0.0) - jnp.where(
                F.has_u, 1.0 / ev["du"], 0.0
            )
            logsum = jnp.where(mu > 0, (ev["f"] - ev["phi"]) / jnp.maximum(mu, 1e-300), 0.0)
            ev["r1"] = ev["r1"] + (mu_new - mu) * binv
            ev["phi"] = ev["f"] - mu_new * logsum
            mu = mu_new
            tau = jnp.maximum(P["tau_min"], 1.0 - mu)

            # ---- KKT with inertia-free δw loop --------------------------------
            dc = jnp.maximum(P["delta_c_bar"] * jnp.maximum(mu ** P["kappa_c"], 1e-10), P["delta_c_min"])
            trial_w = jnp.where(
                st["dw_last"] == 0.0,
                P["delta_w0"],
                jnp.maximum(P["delta_w_min"], P["kappa_w_minus"] * st["dw_last"]),
            )

            report_stats = getattr(kkt, "report_stats", False)

            def kkt_cond(c):
                dw, dv, dy, ok, trips, bs = c
                return (~ok) & (trips < 40)

            def kkt_body(c):
                dw, dv, dy, ok, trips, bs = c
                out = kkt.solve(
                    ev["hvals"], ev["jvals"], ev["sigma"],
                    jnp.full(n, dw, dtype=dtype), dc, ev["r1"], -ev["r"],
                )
                dv2, dy2, pd_ok = out[0], out[1], out[2]
                if report_stats:
                    bs = bs + out[3]
                good = pd_ok & jnp.isfinite(dv2).all()
                if not getattr(kkt, "certifies_inertia", False):
                    # no SPD certificate (CG / low-precision factor): keep the
                    # inertia-free curvature test (see ipm.py for why certified
                    # backends must skip it)
                    curv = F.curvature(ev["hvals"], ev["sigma"], dw, dv2)
                    good = good & (
                        curv >= P["curvature_kappa"] * jnp.vdot(dv2, dv2)
                    )
                # first-ever inflation escalates 100x (Ipopt's κ̄w⁺): a
                # mixed-precision factor can need δw ≈ 1 at the first
                # iterate, and 8x from 1e-4 burns ~6 full KKT solves
                kwp = jnp.where(
                    st["dw_last"] == 0.0,
                    P["kappa_w_plus_bar"], P["kappa_w_plus"],
                )
                dw_next = jnp.where(
                    good, dw, jnp.where(dw == 0.0, trial_w, dw * kwp)
                )
                return (dw_next, jnp.where(good, dv2, dv), jnp.where(good, dy2, dy),
                        good, trips + 1, bs)

            dw0 = jnp.asarray(0.0, dtype)
            dv0 = jnp.zeros(n, dtype=dtype)
            dy0 = jnp.zeros(m, dtype=dtype)
            dw, dv, dy, kkt_ok, kkt_trips, kkt_bs = jax.lax.while_loop(
                kkt_cond, kkt_body,
                (dw0, dv0, dy0, jnp.asarray(False),
                 jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
            )
            dw_last = jnp.where(dw > 0, dw, st["dw_last"])

            dl, du = ev["dl"], ev["du"]
            dzl = jnp.where(F.has_l, mu / dl - zl - zl * dv / dl, 0.0)
            dzu = jnp.where(F.has_u, mu / du - zu + zu * dv / du, 0.0)

            def alpha_fraction():
                a_l_ = jnp.where(F.has_l & (dv < 0), -tau * dl / jnp.where(dv < 0, dv, -1.0), 1.0)
                a_u_ = jnp.where(F.has_u & (dv > 0), tau * du / jnp.where(dv > 0, dv, 1.0), 1.0)
                ap = jnp.minimum(1.0, jnp.minimum(jnp.min(a_l_, initial=1.0), jnp.min(a_u_, initial=1.0)))
                a_zl = jnp.where(F.has_l & (dzl < 0), -tau * zl / jnp.where(dzl < 0, dzl, -1.0), 1.0)
                a_zu = jnp.where(F.has_u & (dzu < 0), -tau * zu / jnp.where(dzu < 0, dzu, -1.0), 1.0)
                ad = jnp.minimum(1.0, jnp.minimum(jnp.min(a_zl, initial=1.0), jnp.min(a_zu, initial=1.0)))
                return ap, ad

            alpha_max, alpha_z = alpha_fraction()

            theta_cur = ev["theta"]
            phi_cur = ev["phi"]
            gphi_dv = (
                jnp.vdot(ev["g"], dv)
                - mu * jnp.sum(jnp.where(F.has_l, dv / dl, 0.0))
                + mu * jnp.sum(jnp.where(F.has_u, dv / du, 0.0))
            )

            alpha_min = jnp.where(
                gphi_dv < 0,
                P["alpha_min_frac"]
                * jnp.minimum(
                    P["gamma_theta"],
                    jnp.minimum(
                        P["gamma_phi"] * theta_cur / jnp.maximum(-gphi_dv, 1e-300),
                        jnp.where(
                            theta_cur <= P["theta_min"],
                            P["delta"] * theta_cur ** P["s_theta"]
                            / jnp.maximum((-gphi_dv) ** P["s_phi"], 1e-300),
                            big,
                        ),
                    ),
                ),
                P["alpha_min_frac"] * P["gamma_theta"],
            )
            alpha_min = jnp.maximum(alpha_min, 1e-16)

            # ---- backtracking filter line search ------------------------------
            def ls_cond(c):
                alpha, accepted, ftype, trials = c
                return (~accepted) & (trials < P["max_ls"]) & (alpha >= alpha_min)

            def ls_body(c):
                alpha, accepted, ftype, trials = c
                v_t = v + alpha * dv
                phi_t, theta_t = F.trial_eval(v_t, mu, st["theta_p"])
                filter_ok = jnp.all(
                    (theta_t <= (1 - P["gamma_theta"]) * filt_th)
                    | (phi_t <= filt_ph - P["gamma_phi"] * filt_th)
                ) & (theta_t < P["theta_max"]) & jnp.isfinite(phi_t) & jnp.isfinite(theta_t)
                switching = (
                    (gphi_dv < 0)
                    & (alpha * (-gphi_dv) ** P["s_phi"] > P["delta"] * theta_cur ** P["s_theta"])
                    & (theta_cur <= P["theta_min"])
                )
                armijo = phi_t <= phi_cur + P["eta_phi"] * alpha * gphi_dv
                suff = (theta_t <= (1 - P["gamma_theta"]) * theta_cur) | (
                    phi_t <= phi_cur - P["gamma_phi"] * theta_cur
                )
                ok = filter_ok & jnp.where(switching, armijo, suff)
                ftype_new = jnp.where(ok, switching, ftype)
                return (
                    jnp.where(ok, alpha, alpha * 0.5),
                    accepted | ok,
                    ftype_new,
                    trials + 1,
                )

            alpha, accepted, f_type, _ = jax.lax.while_loop(
                ls_cond, ls_body, (alpha_max, jnp.asarray(False), jnp.asarray(False), jnp.asarray(0, jnp.int32))
            )

            # ---- null-step recovery (restoration-lite) ---------------------
            # The host IPM escapes a failed line search / exhausted δw loop
            # with feasibility restoration + SOC (ipm.py); inside one XLA
            # program the cheap equivalent is a NULL step: reset the filter
            # (stale entries are the most common blocker), force a stronger
            # starting regularization for the next KKT solve, and only
            # declare "stalled" after 4 consecutive failures. Measured on
            # the 10k-bus AC-OPF f32 loop: the unrecovered loop stalled at
            # iteration 4; recovery lets it run to the acceptable-tol exit.
            fail = (status == _RUNNING) & (~kkt_ok | ~accepted)
            fails = jnp.where(fail, st["fails"] + 1, jnp.zeros_like(st["fails"]))
            status = jnp.where(fail & (fails >= 4), _STALLED, status)
            accepted = accepted & ~fail
            filt_th = jnp.where(fail, jnp.full(_NFILT, big, dtype=dtype), filt_th)
            filt_ph = jnp.where(fail, jnp.full(_NFILT, -big, dtype=dtype), filt_ph)
            nfilt = jnp.where(fail, 0, nfilt)
            dw_last = jnp.where(
                fail,
                jnp.maximum(dw_last * P["kappa_w_plus"], P["delta_w0"]),
                dw_last,
            )

            # filter augmentation (circular) for h-type steps
            slot = jnp.mod(nfilt, _NFILT)
            aug = accepted & ~f_type
            filt_th = jnp.where(
                aug, filt_th.at[slot].set((1 - P["gamma_theta"]) * theta_cur), filt_th
            )
            filt_ph = jnp.where(
                aug, filt_ph.at[slot].set(phi_cur - P["gamma_phi"] * theta_cur), filt_ph
            )
            nfilt = jnp.where(aug, nfilt + 1, nfilt)

            step_ok = accepted & (status == _RUNNING)
            scale = jnp.where(step_ok, 1.0, 0.0)
            v2 = v + scale * alpha * dv
            y2 = y + scale * alpha * dy
            zl2 = zl + scale * alpha_z * dzl
            zu2 = zu + scale * alpha_z * dzu
            dl2 = jnp.where(F.has_l, v2 - F.l, 1.0)
            du2 = jnp.where(F.has_u, F.u - v2, 1.0)
            zl2 = jnp.where(
                F.has_l,
                jnp.clip(zl2, mu / (P["kappa_sigma"] * dl2), P["kappa_sigma"] * mu / dl2),
                0.0,
            )
            zu2 = jnp.where(
                F.has_u,
                jnp.clip(zu2, mu / (P["kappa_sigma"] * du2), P["kappa_sigma"] * mu / du2),
                0.0,
            )

            it = st["it"] + 1
            status = jnp.where(
                (status == _RUNNING) & (it >= P["max_iter"]), _MAXITER, status
            )

            return dict(
                v=v2, y=y2, zl=zl2, zu=zu2,
                mu=mu, tau=tau, dw_last=dw_last, fails=fails,
                filt_th=filt_th, filt_ph=filt_ph, nfilt=nfilt,
                it=it, status=status, n_acc=n_acc,
                prim_inf=prim_inf, dual_inf=dual_inf, comp=comp00,
                theta_p=st["theta_p"],
                kkt_trips=st["kkt_trips"] + kkt_trips,
                kkt_backsolves=st["kkt_backsolves"] + kkt_bs,
            )

        def cond(st):
            return (st["status"] == _RUNNING) & (st["it"] < P["chunk_stop"])

        return jax.lax.while_loop(cond, body, st_in)

    return run


def madipm_hybrid(model, options: Optional[IPMOptions] = None, *, theta=None,
                  switch_tol: float = 1e-4, switch_wall_s: float = 300.0,
                  **kwargs) -> IPMResult:
    """TPU-optimal solve strategy: bulk iterations in the on-device loop
    with an f32 KKT factorization (v5e f64 linear algebra is both slow and
    a compile bomb inside while_loop programs), then a host-driven f64
    polish warm-started from the f32 point. The f64 KKT solve compiles as
    its own small jit in seconds and only runs for the last few iterations.

    `switch_wall_s` bounds the coarse stage's device-loop wall: on
    instances where f32 steps stop paying (conditioning beyond what the
    mixed-precision factor can deliver), the current iterate goes to the
    f64 polish instead of burning the coarse iteration budget.
    """
    from .ipm import madipm

    opts = dataclasses.replace(options) if options is not None else IPMOptions()
    for k, v in kwargs.items():
        if not hasattr(opts, k):
            raise TypeError(f"unknown IPM option {k!r}")
        setattr(opts, k, v)

    t0 = time.time()
    coarse = IPMOptions(**{
        f: getattr(opts, f) for f in opts.__dataclass_fields__
    })
    coarse.tol = max(switch_tol, opts.tol)
    coarse.acceptable_tol = max(coarse.acceptable_tol, coarse.tol * 10)
    coarse.acceptable_iter = 5
    coarse.factor_dtype = coarse.factor_dtype or "float32"
    coarse.device_max_wall_s = min(opts.device_max_wall_s, switch_wall_s)
    r1 = madipm_device(model, coarse, theta=theta)

    if opts.tol >= switch_tol and r1.success:
        return r1

    polish = IPMOptions(**{
        f: getattr(opts, f) for f in opts.__dataclass_fields__
    })
    polish.factor_dtype = None
    polish.delta_c_min = 0.0
    polish.mu_init = max(float(r1.mu), opts.mu_min_factor * opts.tol) \
        if np.isfinite(r1.mu) else 1e-4
    polish.scaling = opts.scaling
    t_polish = time.time()
    r2 = madipm(model, polish, theta=theta,
                warm_start=r1 if r1.x is not None else None)
    r2.detail = dict(
        coarse_status=r1.status,
        coarse_iterations=r1.iterations,
        coarse_wall=r1.wall_time,
        polish_iterations=r2.iterations,
        polish_wall=time.time() - t_polish,
        loop_compile_s=(r1.detail or {}).get("loop_compile_s", -1.0),
        loop_exec_s=(r1.detail or {}).get("loop_exec_s", -1.0),
        kkt_trips=(r1.detail or {}).get("kkt_trips", -1),
        kkt_backsolves=(r1.detail or {}).get("kkt_backsolves", -1),
    )
    r2.iterations += r1.iterations
    r2.wall_time = time.time() - t0
    return r2
