"""KKT linear-system backends for the interior-point solver.

The reference stack delegates KKT solves to external solvers (Ipopt/MadNLP,
/root/reference/src/nlp.jl:460-463); our build ships them on-device. Two
TPU-native strategies:

  * DenseKKT — condensed-space: eliminate the constraint block with dual
    regularization (lifted/relaxed KKT), leaving an SPD matrix
    ``K = W + Σ + δw I + Aᵀ A / δc`` over the primal (x, s) space.
    Assembled by COO scatter-add into a dense buffer under jit; factorized
    with Cholesky (PD check doubles as inertia control — no LDLᵀ inertia
    oracle needed). Accuracy of the elimination is recovered with a few
    rounds of iterative refinement on the *unregularized* augmented system.
    Dense is the right shape for the MXU whenever n fits in HBM.

  * CGKKT — matrix-free conditioned conjugate gradients on the same
    condensed SPD operator, using only jprod/jtprod/hprod-style mat-vecs
    (gathers + segment-sums — no factorization at all). Used when n is too
    large for a dense factor. Jacobi preconditioned.

Both backends consume the same COO (rows, cols, vals) Hessian/Jacobian
buffers the oracle emits — the fixed-sparsity invariant of
/root/reference/src/nlp.jl:1528-1530 is what makes the scatter shapes static.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class KKTStructure:
    """Static index data shared by all backends.

    Primal space is v = (x, s): n = nx + ns where slacks exist for
    non-equality rows (Ipopt-style slack formulation).
    The constraint Jacobian over v is A = [Jc | -P] with P the selection
    of inequality rows (row i of A has -1 at slack column slack_col[i]).
    """

    nx: int
    ns: int
    m: int
    # Hessian COO over x (lower triangle, duplicates allowed)
    hrows: np.ndarray
    hcols: np.ndarray
    # Jacobian COO over x
    jrows: np.ndarray
    jcols: np.ndarray
    # per-constraint-row slack column in v (−1 for equality rows)
    slack_col_of_row: np.ndarray  # (m,) int32: nx + k or -1
    ineq_rows: np.ndarray  # (ns,) int32 row indices owning a slack

    @property
    def n(self) -> int:
        return self.nx + self.ns


def build_structure(model) -> KKTStructure:
    """Derive the slacked KKT structure from an ExaModel-like oracle."""
    lcon = np.asarray(model.lcon)
    ucon = np.asarray(model.ucon)
    m = int(lcon.shape[0])
    is_eq = lcon == ucon
    ineq_rows = np.nonzero(~is_eq)[0].astype(np.int32)
    ns = int(ineq_rows.shape[0])
    slack_col = np.full(m, -1, dtype=np.int32)
    slack_col[ineq_rows] = model.nvar + np.arange(ns, dtype=np.int32)
    hr, hc = model.hess_structure()
    jr, jc = model.jac_structure()
    return KKTStructure(
        nx=model.nvar,
        ns=ns,
        m=m,
        hrows=np.asarray(hr, dtype=np.int32),
        hcols=np.asarray(hc, dtype=np.int32),
        jrows=np.asarray(jr, dtype=np.int32),
        jcols=np.asarray(jc, dtype=np.int32),
        slack_col_of_row=slack_col,
        ineq_rows=ineq_rows,
    )


# ---------------------------------------------------------------------------
# Dense condensed backend
# ---------------------------------------------------------------------------


class DenseKKT:
    """Condensed dense KKT solve; correct for any model small enough that an
    (n × n) dense factor fits (n = nx + ns)."""

    # Cholesky success of the condensed matrix K = W+Σ+δw+AᵀA/δc is an EXACT
    # inertia certificate for the regularized augmented system (inertia is
    # (n, m, 0) iff K ≻ 0) — the IPM can skip its conservative inertia-free
    # curvature test when this is set (the approach of condensed-space
    # interior-point methods, arXiv:2307.16830 companion).
    certifies_inertia = True

    def __init__(self, structure: KKTStructure, dtype=jnp.float64):
        self.s = structure
        self.dtype = dtype
        s = structure
        # static device index arrays
        self._hrows = jnp.asarray(s.hrows)
        self._hcols = jnp.asarray(s.hcols)
        self._jrows = jnp.asarray(s.jrows)
        self._jcols = jnp.asarray(s.jcols)
        self._ineq_rows = jnp.asarray(s.ineq_rows)
        self._slack_cols = jnp.asarray(s.nx + np.arange(s.ns, dtype=np.int32))
        self._solve = jax.jit(self._solve_impl)

    # -- assembly ----------------------------------------------------------
    def _dense_W(self, hvals):
        """Symmetric dense Hessian of the Lagrangian over x (scatter both
        triangles; COO is lower-tri with diagonal stored once)."""
        s = self.s
        W = jnp.zeros((s.nx, s.nx), dtype=self.dtype)
        W = W.at[self._hrows, self._hcols].add(hvals)
        W = W.at[self._hcols, self._hrows].add(
            jnp.where(self._hrows == self._hcols, 0.0, hvals)
        )
        return W

    def _dense_A(self, jvals):
        """Dense A = [Jc | -I_slack] over v."""
        s = self.s
        A = jnp.zeros((s.m, s.n), dtype=self.dtype)
        A = A.at[self._jrows, self._jcols].add(jvals)
        if s.ns:
            A = A.at[self._ineq_rows, self._slack_cols].add(-1.0)
        return A

    def _solve_impl(self, hvals, jvals, sigma, dw, dc, r1, r2):
        """Solve the augmented system

            [ W + Σ + δw I   Aᵀ      ] [dv]   [ r1 ]
            [ A              -δc I   ] [dy] = [ r2 ]

        by condensation  K dv = r1 + Aᵀ r2 / δc,  dy = (A dv − r2) / δc,
        then 3 rounds of iterative refinement against the δc-regularized
        system (the IPM treats δc as part of the model — Ipopt's κc μ
        relaxation) using the same Cholesky factor.
        Returns (dv, dy, pd_ok) where pd_ok = Cholesky succeeded.
        """
        s = self.s
        W = self._dense_W(hvals)
        A = self._dense_A(jvals)
        n = s.n
        H = jnp.zeros((n, n), dtype=self.dtype).at[: s.nx, : s.nx].set(W)
        K = H + jnp.diag(sigma + dw) + (A.T / dc) @ A
        L = jnp.linalg.cholesky(K)
        pd_ok = jnp.all(jnp.isfinite(L))

        def chol_solve(rhs):
            t = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
            return jax.scipy.linalg.solve_triangular(L.T, t, lower=False)

        rhs = r1 + (A.T @ r2) / dc
        dv = chol_solve(rhs)
        dy = (A @ dv - r2) / dc

        # iterative refinement on the full augmented system
        def refine(carry, _):
            dv, dy = carry
            e1 = r1 - (H @ dv + (sigma + dw) * dv + A.T @ dy)
            e2 = r2 - (A @ dv - dc * dy)
            cv = chol_solve(e1 + (A.T @ e2) / dc)
            cy = (A @ cv - e2) / dc
            return (dv + cv, dy + cy), None

        (dv, dy), _ = jax.lax.scan(refine, (dv, dy), None, length=3)
        return dv, dy, pd_ok

    def solve(self, hvals, jvals, sigma, dw, dc, r1, r2):
        return self._solve(hvals, jvals, sigma, dw, dc, r1, r2)


# ---------------------------------------------------------------------------
# Matrix-free CG backend
# ---------------------------------------------------------------------------


class CGKKT:
    """Jacobi-preconditioned CG on the condensed SPD operator.

    No inertia certificate (CG detects indefiniteness only by luck), so the
    IPM keeps its inertia-free curvature test with this backend.

    Mat-vec:  K v = [W vx; 0] + (Σ + δw) v + Aᵀ (A v) / δc
    using COO segment-sum products — the on-device SpMV analogue of
    /root/reference/ext/ExaModelsKernelAbstractions.jl:369-511.
    """

    certifies_inertia = False

    def __init__(self, structure: KKTStructure, dtype=jnp.float64,
                 tol: float = 1e-10, maxiter: Optional[int] = None):
        self.s = structure
        self.dtype = dtype
        self.tol = tol
        self.maxiter = maxiter or max(200, 4 * structure.n)
        s = structure
        self._hrows = jnp.asarray(s.hrows)
        self._hcols = jnp.asarray(s.hcols)
        self._jrows = jnp.asarray(s.jrows)
        self._jcols = jnp.asarray(s.jcols)
        self._ineq_rows = jnp.asarray(s.ineq_rows)
        self._slack_cols = jnp.asarray(s.nx + np.arange(s.ns, dtype=np.int32))
        self._solve = jax.jit(self._solve_impl)

    def _W_mv(self, hvals, vx):
        s = self.s
        lo = hvals * vx[self._hcols]
        out = jax.ops.segment_sum(lo, self._hrows, num_segments=s.nx)
        off = jnp.where(self._hrows == self._hcols, 0.0, hvals) * vx[self._hrows]
        out = out + jax.ops.segment_sum(off, self._hcols, num_segments=s.nx)
        return out

    def _A_mv(self, jvals, v):
        s = self.s
        out = jax.ops.segment_sum(
            jvals * v[self._jcols], self._jrows, num_segments=s.m
        )
        if s.ns:
            out = out.at[self._ineq_rows].add(-v[self._slack_cols])
        return out

    def _At_mv(self, jvals, w):
        s = self.s
        out = jnp.zeros(s.n, dtype=self.dtype)
        out = out.at[: s.nx].set(
            jax.ops.segment_sum(jvals * w[self._jrows], self._jcols, num_segments=s.nx)
        )
        if s.ns:
            out = out.at[self._slack_cols].add(-w[self._ineq_rows])
        return out

    def _diag_K(self, hvals, jvals, sigma, dw, dc):
        s = self.s
        d = sigma + dw
        hd = jnp.where(self._hrows == self._hcols, hvals, 0.0)
        d = d.at[: s.nx].add(
            jax.ops.segment_sum(hd, self._hrows, num_segments=s.nx)
        )
        # column sums of A∘A / dc
        d = d.at[: s.nx].add(
            jax.ops.segment_sum(jvals * jvals, self._jcols, num_segments=s.nx) / dc
        )
        if s.ns:
            d = d.at[self._slack_cols].add(1.0 / dc)
        return d

    def _solve_impl(self, hvals, jvals, sigma, dw, dc, r1, r2):
        s = self.s

        def K_mv(v):
            out = (sigma + dw) * v
            out = out.at[: s.nx].add(self._W_mv(hvals, v[: s.nx]))
            out = out + self._At_mv(jvals, self._A_mv(jvals, v)) / dc
            return out

        diag = self._diag_K(hvals, jvals, sigma, dw, dc)
        Minv = 1.0 / jnp.maximum(diag, 1e-12)

        rhs = r1 + self._At_mv(jvals, r2) / dc
        dv, _ = jax.scipy.sparse.linalg.cg(
            K_mv, rhs, tol=self.tol, maxiter=self.maxiter, M=lambda v: Minv * v
        )
        dy = (self._A_mv(jvals, dv) - r2) / dc
        # PD proxy: K dv should reproduce rhs and curvature must be positive
        pd_ok = jnp.isfinite(dv).all() & (jnp.vdot(dv, K_mv(dv)) > 0)
        return dv, dy, pd_ok

    def solve(self, hvals, jvals, sigma, dw, dc, r1, r2):
        return self._solve(hvals, jvals, sigma, dw, dc, r1, r2)
