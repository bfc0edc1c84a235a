"""Scenario Schur-complement KKT backend for two-stage stochastic programs.

The reference only *annotates* scenario structure (two_stage.jl tags,
/root/reference/src/two_stage.jl:25-43) and leaves exploitation to "a solver
[that] knows how to exploit the scenario structure"
(/root/reference/docs/src/two_stage.jl:44-45). This module IS that solver's
linear-algebra core, designed TPU-first:

The condensed primal system of the interior-point method,

    K dv = r,      K = W + Σ + δw I + AᵀA/δc,

is **block-arrowhead** when variables/constraints carry a scenario
partition: per-scenario diagonal blocks D_s, a first-stage border B_s, and
a first-stage corner. We factor it as

  1. batched Cholesky of all D_s at once  — (S, n_loc, n_loc) cholesky:
     one MXU-friendly batched factorization, scenario axis shardable over
     a `jax.sharding.Mesh` ("scen") so each device factors its local
     scenarios and the Σ_s reductions below become ICI psums inserted by
     GSPMD;
  2. dense first-stage Schur complement
         S00 = K00 − Σ_s B_sᵀ D_s⁻¹ B_s          (n0 × n0, replicated)
     assembled with batched matmuls, Cholesky'd once;
  3. coupling constraint rows (rows touching ≥ 2 scenarios — e.g. an
     expectation/budget row) handled by a Woodbury correction
         K = K_arrow + CᵀC/δc,
         K⁻¹ = Ka⁻¹ − Ka⁻¹Cᵀ (δc I + C Ka⁻¹ Cᵀ)⁻¹ C Ka⁻¹,
     where the capacitance matrix (m_C × m_C) is SPD.

Positive-definiteness of K (the IPM's inertia signal) is exactly:
all D_s PD ∧ S00 PD ∧ capacitance PD — three Cholesky checks.

Everything is static-shaped: the COO→block scatter index maps are computed
once at construction from the model's fixed sparsity (the invariant of
/root/reference/src/nlp.jl:1528-1530).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .kkt import KKTStructure

__all__ = ["ScenarioSchurKKT", "scenario_partition"]


def scenario_partition(structure: KKTStructure, var_scen, con_scen, nscen: int):
    """Validate + build the scenario partition of the slacked primal space.

    Returns a dict of numpy index maps, or raises ValueError when the
    problem is not block-arrowhead (a Hessian / local-Jacobian entry
    coupling two different scenarios).

    Unequal block sizes are allowed: blocks pad to the largest with PHANTOM
    indices (column index n, row index m — one past the end). The solver
    gathers from (n+1)/(m+1)-extended vectors whose phantom entry is 1 for
    the barrier diagonal (keeps padded Cholesky rows PD) and 0 for every
    residual, and scatters back into extended vectors whose phantom slot is
    dropped — so pads cost FLOPs but never touch real data. This is what
    lets the same arrowhead kernel serve both EachScenario replication
    (equal blocks, zero pads) and general graph partitions of a single
    large NLP (parallel/partition.py).
    """
    s = structure
    var_scen = np.asarray(var_scen, dtype=np.int64)
    con_scen = np.asarray(con_scen, dtype=np.int64)
    if var_scen.shape[0] != s.nx or con_scen.shape[0] != s.m:
        raise ValueError("scenario tags do not match structure dims")
    S = int(nscen)
    if S < 1:
        raise ValueError("nscen must be >= 1")

    # v = (x, s): slack of row r inherits the row's scenario
    v_scen = np.concatenate([var_scen, con_scen[s.ineq_rows]])

    fs_cols = np.nonzero(v_scen == 0)[0].astype(np.int32)
    n0 = int(fs_cols.shape[0])
    loc_lists = [np.nonzero(v_scen == k)[0] for k in range(1, S + 1)]
    n_loc = max(int(a.shape[0]) for a in loc_lists)
    if n_loc == 0:
        raise ValueError("no scenario-local columns — nothing to eliminate")
    loc_cols = np.full((S, n_loc), s.n, dtype=np.int32)  # phantom = n
    for k, a in enumerate(loc_lists):
        loc_cols[k, : a.shape[0]] = a

    # column -> (scenario-1, local index) maps; fs -> index into fs_cols
    col_scen = v_scen
    col_local = np.zeros(s.n, dtype=np.int32)
    for k, a in enumerate(loc_lists):
        col_local[a] = np.arange(a.shape[0], dtype=np.int32)
    fs_local = np.zeros(s.n, dtype=np.int32)
    fs_local[fs_cols] = np.arange(n0, dtype=np.int32)

    # rows
    crow_idx = np.nonzero(con_scen == 0)[0].astype(np.int32)
    mC = int(crow_idx.shape[0])
    row_lists = [np.nonzero(con_scen == k)[0] for k in range(1, S + 1)]
    m_loc = max(int(a.shape[0]) for a in row_lists)
    loc_rows = np.full((S, m_loc), s.m, dtype=np.int32)  # phantom = m
    for k, a in enumerate(row_lists):
        loc_rows[k, : a.shape[0]] = a
    row_local = np.zeros(s.m, dtype=np.int32)
    for k, a in enumerate(row_lists):
        row_local[a] = np.arange(a.shape[0], dtype=np.int32)
    crow_local = np.zeros(s.m, dtype=np.int32)
    crow_local[crow_idx] = np.arange(mC, dtype=np.int32)

    return dict(
        S=S, n0=n0, n_loc=n_loc, m_loc=m_loc, mC=mC,
        v_scen=v_scen, fs_cols=fs_cols, loc_cols=loc_cols,
        col_scen=col_scen, col_local=col_local, fs_local=fs_local,
        crow_idx=crow_idx, loc_rows=loc_rows,
        row_local=row_local, crow_local=crow_local,
        con_scen=con_scen,
    )


class ScenarioSchurKKT:
    """Arrowhead-condensed KKT solve over a scenario partition.

    Same interface as DenseKKT/CGKKT: ``solve(hvals, jvals, sigma, dw, dc,
    r1, r2) -> (dv, dy, pd_ok)`` on the same regularized augmented system,
    so it is a drop-in `linear_solver="schur"` backend for `madipm`.

    `mesh`: optional `jax.sharding.Mesh` with a scenario axis (default name
    "scen"); batched per-scenario intermediates get sharding constraints on
    the leading S axis so GSPMD partitions the factorization and inserts
    psums for the Schur reductions. S must be divisible by the axis size.
    """

    # dense Cholesky blocks + SPD Schur complement: exact inertia
    # certificate, same argument as DenseKKT.certifies_inertia
    certifies_inertia = True

    def __init__(self, structure: KKTStructure, var_scen, con_scen,
                 nscen: int, dtype=jnp.float64,
                 mesh: Optional[object] = None, mesh_axis: str = "scen"):
        self.s = structure
        self.dtype = dtype
        p = scenario_partition(structure, var_scen, con_scen, nscen)
        self.p = p
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        if mesh is not None:
            axis_size = dict(zip(mesh.axis_names, mesh.devices.shape))[mesh_axis]
            if p["S"] % axis_size:
                raise ValueError(
                    f"nscen={p['S']} not divisible by mesh axis "
                    f"{mesh_axis!r} size {axis_size}"
                )

        self._build_maps()
        self._solve = jax.jit(self._solve_impl)

    # ------------------------------------------------------------------
    def _build_maps(self):
        s, p = self.s, self.p
        S, n0 = p["S"], p["n0"]
        cs, cl, fl = p["col_scen"], p["col_local"], p["fs_local"]

        # ---- Hessian entries (lower-tri COO over x, duplicates allowed) --
        hi = s.hrows.astype(np.int64)
        hj = s.hcols.astype(np.int64)
        si, sj = cs[hi], cs[hj]
        if np.any((si != sj) & (si != 0) & (sj != 0)):
            bad = np.nonzero((si != sj) & (si != 0) & (sj != 0))[0][:3]
            raise ValueError(
                "Hessian couples two scenarios directly (entries "
                f"{[(int(hi[b]), int(hj[b])) for b in bad]}); not arrowhead"
            )
        both0 = (si == 0) & (sj == 0)
        bothS = (si == sj) & (si > 0)
        mixed = ~both0 & ~bothS  # one fs, one scenario

        # K00: scatter with symmetric duplication (off-diag twice)
        k = np.nonzero(both0)[0]
        off = hi[k] != hj[k]
        self._h0_sel = np.concatenate([k, k[off]]).astype(np.int32)
        self._h0_i = np.concatenate([fl[hi[k]], fl[hj[k][off]]]).astype(np.int32)
        self._h0_j = np.concatenate([fl[hj[k]], fl[hi[k][off]]]).astype(np.int32)

        # D_s: same with batch index
        k = np.nonzero(bothS)[0]
        off = hi[k] != hj[k]
        self._hD_sel = np.concatenate([k, k[off]]).astype(np.int32)
        self._hD_b = (np.concatenate([si[k], si[k][off]]) - 1).astype(np.int32)
        self._hD_i = np.concatenate([cl[hi[k]], cl[hj[k][off]]]).astype(np.int32)
        self._hD_j = np.concatenate([cl[hj[k]], cl[hi[k][off]]]).astype(np.int32)

        # Border B (scenario row, fs col): entry may be stored either way
        k = np.nonzero(mixed)[0]
        i_is_scen = si[k] > 0
        bi = np.where(i_is_scen, hi[k], hj[k])  # scenario-side column
        bj = np.where(i_is_scen, hj[k], hi[k])  # fs-side column
        self._hB_sel = k.astype(np.int32)
        self._hB_b = (cs[bi] - 1).astype(np.int32)
        self._hB_i = cl[bi].astype(np.int32)
        self._hB_j = fl[bj].astype(np.int32)

        # ---- Jacobian entries --------------------------------------------
        jr = s.jrows.astype(np.int64)
        jc = s.jcols.astype(np.int64)
        rs = p["con_scen"][jr]
        csj = cs[jc]
        local = rs > 0
        if np.any(local & (csj > 0) & (csj != rs)):
            raise ValueError(
                "a scenario-local constraint row touches another scenario's "
                "variables; not arrowhead"
            )
        # local rows, scenario cols -> A_loc
        k = np.nonzero(local & (csj > 0))[0]
        self._aL_sel = k.astype(np.int32)
        self._aL_b = (rs[k] - 1).astype(np.int32)
        self._aL_r = p["row_local"][jr[k]].astype(np.int32)
        self._aL_c = cl[jc[k]].astype(np.int32)
        # local rows, fs cols -> A_fs
        k = np.nonzero(local & (csj == 0))[0]
        self._aF_sel = k.astype(np.int32)
        self._aF_b = (rs[k] - 1).astype(np.int32)
        self._aF_r = p["row_local"][jr[k]].astype(np.int32)
        self._aF_c = fl[jc[k]].astype(np.int32)
        # coupling rows -> Cs (scenario cols) and C0 (fs cols)
        k = np.nonzero(~local & (csj > 0))[0]
        self._cS_sel = k.astype(np.int32)
        self._cS_b = (csj[k] - 1).astype(np.int32)
        self._cS_r = p["crow_local"][jr[k]].astype(np.int32)
        self._cS_c = cl[jc[k]].astype(np.int32)
        k = np.nonzero(~local & (csj == 0))[0]
        self._c0_sel = k.astype(np.int32)
        self._c0_r = p["crow_local"][jr[k]].astype(np.int32)
        self._c0_c = fl[jc[k]].astype(np.int32)

        # ---- slack columns (A has -1 at (row, slack_col)) ----------------
        ir = s.ineq_rows.astype(np.int64)
        scol = (s.nx + np.arange(s.ns)).astype(np.int64)
        rsl = p["con_scen"][ir]
        loc = rsl > 0
        self._sL_b = (rsl[loc] - 1).astype(np.int32)
        self._sL_r = p["row_local"][ir[loc]].astype(np.int32)
        self._sL_c = cl[scol[loc]].astype(np.int32)
        # coupling ineq rows: slack is first-stage by construction
        self._s0_r = p["crow_local"][ir[~loc]].astype(np.int32)
        self._s0_c = fl[scol[~loc]].astype(np.int32)

        # device copies of gather maps
        self._fs_cols = jnp.asarray(p["fs_cols"])
        self._loc_cols = jnp.asarray(p["loc_cols"])
        self._loc_rows = jnp.asarray(p["loc_rows"])
        self._crow_idx = jnp.asarray(p["crow_idx"])
        self._n0 = n0
        self._S = S
        self._n_loc = p["n_loc"]
        self._m_loc = p["m_loc"]
        self._mC = p["mC"]

    # ------------------------------------------------------------------
    def _shard(self, a):
        """Constrain the leading scenario axis onto the mesh (no-op when
        mesh is None); GSPMD then partitions batched factorizations and
        inserts psum for contractions that sum over the S axis."""
        if self.mesh is None:
            return a
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = P(self.mesh_axis, *([None] * (a.ndim - 1)))
        return jax.lax.with_sharding_constraint(
            a, NamedSharding(self.mesh, spec)
        )


    # ------------------------------------------------------------------
    def _solve_impl(self, hvals, jvals, sigma, dw, dc, r1, r2):
        S, n0, n_loc, m_loc, mC = (
            self._S, self._n0, self._n_loc, self._m_loc, self._mC,
        )
        dt = self.dtype
        d = sigma + dw

        # ---- block assembly (scatter from global COO values) -------------
        Dw = jnp.zeros((S, n_loc, n_loc), dt)
        Dw = Dw.at[self._hD_b, self._hD_i, self._hD_j].add(hvals[self._hD_sel])
        Bw = jnp.zeros((S, n_loc, n0), dt)
        Bw = Bw.at[self._hB_b, self._hB_i, self._hB_j].add(hvals[self._hB_sel])
        K00 = jnp.zeros((n0, n0), dt)
        K00 = K00.at[self._h0_i, self._h0_j].add(hvals[self._h0_sel])

        A_loc = jnp.zeros((S, m_loc, n_loc), dt)
        A_loc = A_loc.at[self._aL_b, self._aL_r, self._aL_c].add(
            jvals[self._aL_sel]
        )
        A_loc = A_loc.at[self._sL_b, self._sL_r, self._sL_c].add(-1.0)
        A_fs = jnp.zeros((S, m_loc, n0), dt)
        A_fs = A_fs.at[self._aF_b, self._aF_r, self._aF_c].add(
            jvals[self._aF_sel]
        )
        Cs = jnp.zeros((S, mC, n_loc), dt)
        Cs = Cs.at[self._cS_b, self._cS_r, self._cS_c].add(jvals[self._cS_sel])
        C0 = jnp.zeros((mC, n0), dt)
        C0 = C0.at[self._c0_r, self._c0_c].add(jvals[self._c0_sel])
        C0 = C0.at[self._s0_r, self._s0_c].add(-1.0)

        Dw, Bw, A_loc, A_fs, Cs = map(
            self._shard, (Dw, Bw, A_loc, A_fs, Cs)
        )

        # phantom-extended gathers: index n/m (block padding for unequal
        # partition sizes) reads a 1 for the diagonal (padded Cholesky rows
        # stay PD) and a 0 for every residual — pads never touch real data
        d_ext = jnp.concatenate([d, jnp.ones(1, dt)])
        r1_ext = jnp.concatenate([r1, jnp.zeros(1, dt)])
        r2_ext = jnp.concatenate([r2, jnp.zeros(1, dt)])
        d_loc = self._shard(d_ext[self._loc_cols])       # (S, n_loc)
        d_fs = d[self._fs_cols]                          # (n0,)
        r1_loc = self._shard(r1_ext[self._loc_cols])
        r1_fs = r1[self._fs_cols]
        r2_loc = self._shard(r2_ext[self._loc_rows])     # (S, m_loc)
        r2C = r2[self._crow_idx]                         # (mC,)

        # ---- condensation of local rows (MXU batched matmuls) ------------
        eye = jnp.eye(n_loc, dtype=dt)
        D = (
            Dw
            + d_loc[:, :, None] * eye
            + jnp.einsum("smi,smj->sij", A_loc, A_loc) / dc
        )
        B = Bw + jnp.einsum("smi,smj->sij", A_loc, A_fs) / dc

        L = jnp.linalg.cholesky(D)
        ok_D = jnp.all(jnp.isfinite(L))

        def d_solve(b):  # b: (S, n_loc, k)
            t = jax.lax.linalg.triangular_solve(
                L, b, left_side=True, lower=True
            )
            return jax.lax.linalg.triangular_solve(
                L, t, left_side=True, lower=True, transpose_a=True
            )

        # stacked border U = [B | Csᵀ]: one batched triangular solve and
        # one contraction cover BᵀD⁻¹B, C D⁻¹B and C D⁻¹Cᵀ together
        U = jnp.concatenate([B, jnp.swapaxes(Cs, 1, 2)], axis=2)
        DinvU = d_solve(U)                               # (S, n_loc, n0+mC)
        DinvB = DinvU[:, :, :n0]
        DinvCt = DinvU[:, :, n0:]

        # contract straight to the replicated outputs: GSPMD computes the
        # per-device partial sums inside the einsum and emits ONE
        # all-reduce each, with no (S, ...) intermediate materialized
        M = jnp.einsum("sni,snk->ik", U, DinvU)          # (n0+mC, n0+mC)
        G = jnp.einsum("smi,smk->ik", A_fs, A_fs)        # (n0, n0)

        # first-stage Schur block with coupling duals kept EXPLICIT:
        #   [ E0'   Fᵀ  ] [dv0]   (E0' may be near-singular alone — e.g. a
        #   [ F    -Hc  ] [dyC]    coupling-row slack touched by no local
        # row — but the saddle pair is well-posed; eliminate dyC through
        # the SPD capacitance Hc = δcI + Σ C_s D⁻¹ C_sᵀ.)
        E0p = K00 + jnp.diag(d_fs) + G / dc - M[:n0, :n0]
        F = C0 - M[n0:, :n0]                              # (mC, n0)
        Hc = dc * jnp.eye(mC, dtype=dt) + M[n0:, n0:]
        LHc = jnp.linalg.cholesky(Hc)
        ok_M = jnp.all(jnp.isfinite(LHc))
        HcinvF = (
            jax.scipy.linalg.cho_solve((LHc, True), F)
            if mC
            else jnp.zeros((0, n0), dt)
        )
        Sfs = E0p + F.T @ HcinvF                          # true fs Schur, SPD
        LS = jnp.linalg.cholesky(Sfs)
        ok_S = jnp.all(jnp.isfinite(LS)) if n0 else jnp.asarray(True)

        def sfs_solve(b):  # (n0,)
            t = jax.scipy.linalg.solve_triangular(LS, b, lower=True)
            return jax.scipy.linalg.solve_triangular(LS.T, t, lower=False)

        def solve_once(b1_fs, b1_loc, b2_loc, b2C):
            """Direct solve of the condensed system for block RHS."""
            # fold local constraint rows into the primal blocks
            rhat_loc = b1_loc + jnp.einsum("smn,sm->sn", A_loc, b2_loc) / dc
            Dinv_r = d_solve(rhat_loc[:, :, None])[:, :, 0]  # (S, n_loc)
            U_dr = jnp.einsum("sni,sn->i", U, Dinv_r)     # Σ [Bᵀ;C] D⁻¹ r̂
            rhat_fs = b1_fs + jnp.einsum("smn,sm->n", A_fs, b2_loc) / dc
            b1p = rhat_fs - U_dr[:n0]
            b2p = b2C - U_dr[n0:]
            dv0 = sfs_solve(
                b1p + HcinvF.T @ b2p if mC else b1p
            )
            dyC = (
                jax.scipy.linalg.cho_solve((LHc, True), F @ dv0 - b2p)
                if mC
                else jnp.zeros(0, dt)
            )
            dvs = (
                Dinv_r
                - (DinvB @ dv0[:, None])[:, :, 0]
                - jnp.einsum("snc,c->sn", DinvCt, dyC)
            )
            dy_loc = (
                jnp.einsum("smn,sn->sm", A_loc, dvs)
                + jnp.einsum("smn,n->sm", A_fs, dv0)
                - b2_loc
            ) / dc
            return dv0, dvs, dy_loc, dyC

        r1_fs0, r1_loc0 = r1_fs, r1_loc
        r2_loc0, r2C0 = r2_loc, r2C
        dv0, dvs, dy_loc, dyC = solve_once(r1_fs0, r1_loc0, r2_loc0, r2C0)

        # ---- blockwise iterative refinement on the augmented system -------
        # (same δc-regularized system as DenseKKT._solve_impl; essential when
        # δc → κc·μ becomes tiny late in the IPM)
        def refine(carry, _):
            dv0, dvs, dy_loc, dyC = carry
            # W dv + (σ+δw) dv + Aᵀ dy, blockwise; the three first-stage
            # reductions ride ONE stacked collective
            Wv_loc = (
                jnp.einsum("sij,sj->si", Dw, dvs)
                + jnp.einsum("sij,j->si", Bw, dv0)
            )
            Wv_fs = K00 @ dv0 + jnp.einsum("sij,si->j", Bw, dvs)
            afs_dy = jnp.einsum("smn,sm->n", A_fs, dy_loc)
            cs_dvs = jnp.einsum("scn,sn->c", Cs, dvs)
            Aty_loc = (
                jnp.einsum("smn,sm->sn", A_loc, dy_loc)
                + jnp.einsum("scn,c->sn", Cs, dyC)
            )
            Aty_fs = afs_dy + C0.T @ dyC
            e1_loc = r1_loc0 - (Wv_loc + d_loc * dvs + Aty_loc)
            e1_fs = r1_fs0 - (Wv_fs + d_fs * dv0 + Aty_fs)
            Av_loc = (
                jnp.einsum("smn,sn->sm", A_loc, dvs)
                + jnp.einsum("smn,n->sm", A_fs, dv0)
            )
            Av_C = C0 @ dv0 + cs_dvs
            e2_loc = r2_loc0 - (Av_loc - dc * dy_loc)
            e2_C = r2C0 - (Av_C - dc * dyC)
            c0, cs, cl, cC = solve_once(e1_fs, e1_loc, e2_loc, e2_C)
            return (dv0 + c0, dvs + cs, dy_loc + cl, dyC + cC), None

        (dv0, dvs, dy_loc, dyC), _ = jax.lax.scan(
            refine, (dv0, dvs, dy_loc, dyC), None, length=3
        )

        # ---- scatter back to flat (dv, dy): phantom slot n/m dropped ------
        dv = jnp.zeros(self.s.n + 1, dt)
        dv = dv.at[self._loc_cols.reshape(-1)].set(dvs.reshape(-1))
        dv = dv[: self.s.n].at[self._fs_cols].set(dv0)
        dy = jnp.zeros(self.s.m + 1, dt)
        if m_loc:
            dy = dy.at[self._loc_rows.reshape(-1)].set(dy_loc.reshape(-1))
        dy = dy[: self.s.m]
        if mC:
            dy = dy.at[self._crow_idx].set(dyC)

        pd_ok = ok_D & ok_S & ok_M
        return dv, dy, pd_ok

    def solve(self, hvals, jvals, sigma, dw, dc, r1, r2):
        return self._solve(hvals, jvals, sigma, dw, dc, r1, r2)
