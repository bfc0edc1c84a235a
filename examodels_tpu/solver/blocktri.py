"""Block-tridiagonal condensed KKT backend — the TPU-native sparse factorization.

General sparse LDLᵀ does not map to the MXU; instead we exploit that after
RCM reordering the condensed matrix

    K = P (W + Σ + δw I + Aᵀ A / δc) Pᵀ

of every problem family in scope (chained NLPs, trapezoidal optimal control,
finite-difference grids, power networks — all near-banded graphs) has small
half-bandwidth. Partitioning into nb blocks of size b ≥ half-bandwidth makes
K block-tridiagonal; its Cholesky factor is block-bidiagonal and the
factorization is a `lax.scan` of dense b×b ops (cholesky / triangular solve /
SYRK) that run on the MXU. Cost O(n b²), memory O(n b) — the structured
analogue of the reference's "COO with fixed slots" philosophy applied to the
factorization itself (design rationale: SURVEY.md §7 "hard parts").

Symbolic phase (host, build time): RCM via scipy.sparse.csgraph, bandwidth
measurement, block partition, and precomputed flat scatter destinations for
every runtime value source:
  * Hessian COO (lower-tri values, both mirror images),
  * Σ + δw diagonal,
  * Aᵀ A pair products (one entry per within-row pair of A's COO,
    A = [S·J | −P] including slack columns).
Runtime assembly is a single fused segment-sum scatter into the (D, E)
block arrays — no sparse data structures on device.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .kkt import KKTStructure


def _round_up(x, k):
    return ((x + k - 1) // k) * k


@dataclass
class _Symbolic:
    perm: np.ndarray  # new <- old ordering: K_new[i,j] = K[perm[i], perm[j]]
    b: int  # block size
    nb: int  # number of blocks
    n_pad: int
    # scatter destinations (flat into [D | E] storage)
    hess_dest: np.ndarray  # for doubled hessian entries
    hess_src: np.ndarray  # source index into hvals (with mirror duplication)
    hess_is_mirror: np.ndarray
    diag_dest: np.ndarray  # (n,) for sigma + dw
    pair_dest: np.ndarray  # for AᵀA pairs
    pair_k1: np.ndarray
    pair_k2: np.ndarray
    pair_coeff: np.ndarray  # 1.0 within-diag or 2.0? (stored per orientation)


class BlockTriKKT:
    """Condensed KKT solve via block-tridiagonal Cholesky.

    Same interface as DenseKKT/CGKKT: solve(hvals, jvals, sigma, dw, dc,
    r1, r2) -> (dv, dy, pd_ok).
    """

    def __init__(self, structure: KKTStructure, dtype=jnp.float64,
                 min_block: int = 128, max_block: int = 4096,
                 factor_dtype=None, ir_rounds: int = 3,
                 cg_maxiter: int = 120, cg_accept: float = 1e-8):
        """`factor_dtype` (e.g. jnp.float32) factorizes in lower precision
        on the MXU with Jacobi equilibration, recovering accuracy via
        `ir_rounds` of iterative refinement in `dtype` — the mixed-precision
        strategy for TPUs whose f64 is emulated (v5e).

        `cg_maxiter`/`cg_accept` bound the mixed-precision PCG recovery:
        the condensed rhs carries a 1/δc inflation, and the dual step
        dy = (A·dv − r2)/δc turns any unconverged condensed residual
        directly into dual infeasibility (measured at 10k-bus AC-OPF,
        δc=1e-5: a 40-iteration cap left CG at its ~1e-8 acceptance level,
        dual_inf ~3e4, and the loop stalled in null steps; the error
        scaled exactly 1/δc across δc sweeps). The cap must be high enough
        for CG to reach its 1e-13 target at tail conditioning — it exits
        early when converged, so a generous cap costs nothing on easy
        systems. `cg_accept` stays at the step-quality level the IPM can
        absorb; tightening it converts borderline-but-usable steps into
        δw-inflation rejections (measured: camshape-60 f32 stalls with
        1e-11 where 1e-8 converges)."""
        self.s = structure
        self.dtype = dtype
        self.factor_dtype = factor_dtype or dtype
        self.ir_rounds = ir_rounds if factor_dtype is None else max(ir_rounds, 6)
        self.cg_maxiter = int(cg_maxiter)
        self.cg_accept = float(cg_accept)
        # Cholesky success of the condensed matrix is an exact inertia
        # certificate (see DenseKKT.certifies_inertia) — but ONLY when the
        # factorization runs in the working precision. An f32 factor can
        # succeed on a matrix whose smallest eigenvalue is negative below
        # f32 roundoff, and IR/PCG residual convergence says nothing about
        # definiteness, so the mixed-precision backend keeps the IPM's
        # curvature safeguard active instead of certifying.
        self.certifies_inertia = jnp.dtype(self.factor_dtype) == jnp.dtype(dtype)
        s = structure
        n, m = s.n, s.m

        # ---- A COO over v = (x, s): J part + slack part -------------------
        a_rows = np.concatenate([s.jrows, s.ineq_rows]).astype(np.int64)
        a_cols = np.concatenate(
            [s.jcols, s.nx + np.arange(s.ns, dtype=np.int64)]
        ).astype(np.int64)
        self._n_j = len(s.jrows)  # first n_j A-values come from jvals; rest are −1

        # ---- adjacency graph of K ----------------------------------------
        import scipy.sparse as sp
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        # hessian couplings
        gi = [s.hrows.astype(np.int64)]
        gj = [s.hcols.astype(np.int64)]
        # AᵀA couplings: all pairs within each row
        order = np.argsort(a_rows, kind="stable")
        ar, ac = a_rows[order], a_cols[order]
        counts = np.bincount(ar, minlength=m)
        # build pair lists per row (vectorized: offsets into sorted arrays)
        ptr = np.concatenate([[0], np.cumsum(counts)])
        # vectorized within-row pair enumeration, grouped by row nnz count
        pair_k1, pair_k2 = [], []
        for c in np.unique(counts):
            if c == 0:
                continue
            rows_c = np.nonzero(counts == c)[0]
            starts = ptr[rows_c]
            i1, i2 = np.triu_indices(int(c))
            pair_k1.append((starts[:, None] + i1[None, :]).ravel())
            pair_k2.append((starts[:, None] + i2[None, :]).ravel())
        if pair_k1:
            pk1 = np.concatenate(pair_k1)
            pk2 = np.concatenate(pair_k2)
        else:
            pk1 = pk2 = np.zeros(0, dtype=np.int64)
        gi.append(ac[pk1])
        gj.append(ac[pk2])

        gi = np.concatenate(gi + [np.arange(n)])
        gj = np.concatenate(gj + [np.arange(n)])
        adj = sp.coo_matrix(
            (np.ones(len(gi)), (gi, gj)), shape=(n, n)
        ).tocsr()
        adj = adj + adj.T
        rcm = np.asarray(reverse_cuthill_mckee(adj, symmetric_mode=True))
        inv = np.empty(n, dtype=np.int64)
        inv[rcm] = np.arange(n)

        # half bandwidth in permuted ordering
        pi, pj = inv[gi], inv[gj]
        hb = int(np.max(np.abs(pi - pj), initial=0))
        b = max(min_block, _round_up(hb + 1, 64))
        if b > max_block:
            raise ValueError(
                f"RCM bandwidth {hb} exceeds max_block {max_block}; "
                "use the CG backend for this problem"
            )
        nb = max(1, _round_up(n, b) // b)
        n_pad = nb * b

        self.perm = rcm  # K_new[i] corresponds to old index rcm[i]
        self.inv = inv
        self.b, self.nb, self.n_pad = b, nb, n_pad

        # ---- scatter destination computation ------------------------------
        # storage: D (nb, b, b) then E (nb-1, b, b); E[k] = block (k+1, k)
        D_sz = nb * b * b

        def dest_of(i, j):
            """Flat destination for K[i, j] with i >= j (lower triangle),
            in permuted coordinates."""
            bi, bj = i // b, j // b
            oi, oj = i % b, j % b
            same = bi == bj
            d_flat = (bi * b + oi) * b + oj
            e_flat = D_sz + ((bi - 1) * b + oi) * b + oj
            return np.where(same, d_flat, e_flat)

        # hessian: store both (i,j) and (j,i), keeping lower triangle of the
        # permuted matrix; each COO value v contributes to K[pi,pj] and
        # K[pj,pi]; in lower-tri storage that is one entry if pi!=pj (the
        # larger first) PLUS the diagonal case once.
        hi_p, hj_p = inv[s.hrows.astype(np.int64)], inv[s.hcols.astype(np.int64)]
        lo = np.minimum(hi_p, hj_p)
        hi_ = np.maximum(hi_p, hj_p)
        self._hess_dest = dest_of(hi_, lo).astype(np.int32)
        # diagonal entries of K
        di = np.arange(n)
        self._diag_dest = dest_of(inv[di], inv[di]).astype(np.int32)
        # AᵀA pairs: value = a[k1]*a[k2]; entry (c1, c2); symmetric — store
        # lower triangle once; if c1 == c2 (same column twice in a row —
        # duplicate COO coords) it is diagonal.
        pc1, pc2 = inv[ac[pk1]], inv[ac[pk2]]
        plo = np.minimum(pc1, pc2)
        phi = np.maximum(pc1, pc2)
        self._pair_dest = dest_of(phi, plo).astype(np.int32)
        self._pair_k1 = order[pk1].astype(np.int32)  # indices into a-values
        self._pair_k2 = order[pk2].astype(np.int32)
        # distinct positions sharing one column hit the diagonal from both
        # orders of the double sum Σ a_k1 a_k2 — count them twice
        self._pair_coeff = np.where(
            (pk1 != pk2) & (ac[pk1] == ac[pk2]), 2.0, 1.0
        )
        self._a_rows = a_rows.astype(np.int32)
        self._a_cols = a_cols.astype(np.int32)
        self._store = int(D_sz + max(0, (nb - 1)) * b * b)

        self._jit_solve = jax.jit(self._solve_impl)

    # ------------------------------------------------------------------
    def _avals(self, jvals):
        s = self.s
        return jnp.concatenate(
            [jvals, -jnp.ones(s.ns, dtype=self.dtype)]
        ) if s.ns else jvals

    def _assemble(self, hvals, jvals, sigma, dw, dc):
        """Scatter all value sources into (D, E) block storage."""
        b, nb = self.b, self.nb
        avals = self._avals(jvals)
        pair_vals = (
            jnp.asarray(self._pair_coeff, dtype=self.dtype)
            * avals[self._pair_k1] * avals[self._pair_k2] / dc
        )
        buf = jnp.zeros(self._store, dtype=self.dtype)
        buf = buf.at[self._hess_dest].add(hvals)
        buf = buf.at[self._diag_dest].add(sigma + dw)  # dest is already permuted
        buf = buf.at[self._pair_dest].add(pair_vals)
        D = buf[: nb * b * b].reshape(nb, b, b)
        E_flat = buf[nb * b * b :]
        E = (
            E_flat.reshape(max(nb - 1, 0), b, b)
            if nb > 1
            else jnp.zeros((0, b, b), dtype=self.dtype)
        )
        # symmetrize diagonal blocks (we stored lower triangle only)
        tril = jnp.tril(jnp.ones((b, b), dtype=self.dtype))
        strict = jnp.tril(jnp.ones((b, b), dtype=self.dtype), -1)
        D = D * tril[None] + jnp.swapaxes(D * strict[None], 1, 2)
        # padding rows: unit diagonal so Cholesky stays PD
        if self.n_pad > self.s.n:
            pad_idx = jnp.arange(self.s.n, self.n_pad)
            bi = pad_idx // b
            oi = pad_idx % b
            D = D.at[bi, oi, oi].add(1.0)
        return D, E

    def _equilibrate(self, D, E):
        """Jacobi scaling s = 1/√diag(K); returns scaled (D, E, s) with
        blocks cast to factor_dtype.

        Mixed precision adds a STATIC-PIVOTING shift ε·I (ε = 256·eps of
        the factor dtype ≈ 3e-5 for f32) to the scaled diagonal of the
        factor input only: a long Schur-complement Cholesky chain in f32
        loses positive-definiteness to roundoff once cond(K̂) approaches
        1/eps_f32, NaNs the whole factor, and sends the IPM's δw loop into
        runaway inflation — after which dv≈0 and the condensed dual
        recovery dy=(A·dv−r2)/δc returns the poisoned step dy≈−r2/δc
        (measured at 10k-bus AC-OPF: dual_inf ≈ prim_inf/δc = 3e4, scaling
        exactly 1/δc across δc sweeps, while 2000-bus was unaffected). The
        shift exists ONLY inside the preconditioner; the f64 PCG corrects
        the ~3e-5 unit-diagonal bias in a couple of extra iterations, and
        true indefiniteness is still caught by the IPM's curvature test on
        the corrected step (this backend does not certify inertia in mixed
        precision)."""
        b, nb = self.b, self.nb
        diag = jnp.diagonal(D, axis1=1, axis2=2)  # (nb, b)
        s = jax.lax.rsqrt(jnp.maximum(diag, 1e-300))
        Ds = D * s[:, :, None] * s[:, None, :]
        if nb > 1:
            Es = E * s[1:, :, None] * s[:-1, None, :]
        else:
            Es = E
        Ds = Ds.astype(self.factor_dtype)
        Es = Es.astype(self.factor_dtype)
        if jnp.dtype(self.factor_dtype) != jnp.dtype(self.dtype):
            shift = 256.0 * float(jnp.finfo(self.factor_dtype).eps)
            eye = jnp.eye(b, dtype=self.factor_dtype)
            Ds = Ds + shift * eye
        return Ds, Es, s

    def _chol_blocktri(self, D, E):
        """Block-tridiagonal Cholesky. Returns (Linv, L_sub, ok) where
        Linv[k] = L_k⁻¹ is materialized (one b×b triangular solve against I
        per block) so the subsequent forward/backward sweeps are pure
        matmuls — trisolves with vector right-hand sides are MXU-hostile,
        matvecs with L⁻¹ are not."""
        b, nb = self.b, self.nb
        fdt = D.dtype
        eye = jnp.eye(b, dtype=fdt)

        def step(carry, blocks):
            C_prev = carry  # L[k, k-1] (b, b); zeros for k = 0
            Dk, Ek = blocks  # Ek = A[k+1, k] (or zeros for last)
            Dk = Dk - C_prev @ C_prev.T
            Lk = jnp.linalg.cholesky(Dk)
            Linv = jax.scipy.linalg.solve_triangular(Lk, eye, lower=True)
            C_next = Ek @ Linv.T
            return C_next, (Linv, C_next)

        E_in = jnp.concatenate(
            [E, jnp.zeros((1, b, b), dtype=fdt)], axis=0
        ) if nb > 1 else jnp.zeros((1, b, b), dtype=fdt)
        if nb == 1:
            L0 = jnp.linalg.cholesky(D[0])
            Linv0 = jax.scipy.linalg.solve_triangular(L0, eye, lower=True)
            ok = jnp.all(jnp.isfinite(Linv0))
            return Linv0[None], jnp.zeros((0, b, b), dtype=fdt), ok
        init = jnp.zeros((b, b), dtype=fdt)
        _, (Linvs, Cs) = jax.lax.scan(step, init, (D, E_in))
        ok = jnp.all(jnp.isfinite(Linvs))
        return Linvs, Cs[:-1], ok

    def _solve_blocktri(self, Linv, Ls, rhs):
        """Solve L Lᵀ x = rhs given materialized block inverses
        (matmul-only sweeps)."""
        b, nb = self.b, self.nb
        fdt = Linv.dtype
        r = rhs.reshape(nb, b).astype(fdt)

        if nb == 1:
            y = Linv[0] @ r[0]
            return (Linv[0].T @ y).reshape(-1)

        Ls_in = jnp.concatenate(
            [jnp.zeros((1, b, b), dtype=fdt), Ls], axis=0
        )

        def fwd(carry, blocks):
            y_prev = carry
            Li, Ck, rk = blocks  # Ck = L[k, k-1]
            yk = Li @ (rk - Ck @ y_prev)
            return yk, yk

        _, Y = jax.lax.scan(fwd, jnp.zeros(b, dtype=fdt), (Linv, Ls_in, r))

        Ls_bwd = jnp.concatenate(
            [Ls, jnp.zeros((1, b, b), dtype=fdt)], axis=0
        )

        def bwd(carry, blocks):
            x_next = carry
            Li, Ck1, yk = blocks  # Ck1 = L[k+1, k]
            xk = Li.T @ (yk - Ck1.T @ x_next)
            return xk, xk

        _, X = jax.lax.scan(
            bwd, jnp.zeros(b, dtype=fdt), (Linv, Ls_bwd, Y), reverse=True
        )
        return X.reshape(-1)

    def _A_mv(self, avals, v):
        s = self.s
        return jax.ops.segment_sum(
            avals * v[self._a_cols], self._a_rows, num_segments=s.m
        )

    def _At_mv(self, avals, w):
        s = self.s
        return jax.ops.segment_sum(
            avals * w[self._a_rows], self._a_cols, num_segments=s.n
        )

    def _W_mv(self, hvals, vx):
        s = self.s
        hr = jnp.asarray(s.hrows)
        hc = jnp.asarray(s.hcols)
        out = jax.ops.segment_sum(hvals * vx[hc], hr, num_segments=s.nx)
        off = jnp.where(hr == hc, 0.0, hvals) * vx[hr]
        out = out + jax.ops.segment_sum(off, hc, num_segments=s.nx)
        return out

    def _solve_impl(self, hvals, jvals, sigma, dw, dc, r1, r2):
        s = self.s
        n = s.n
        avals = self._avals(jvals)
        D, E = self._assemble(hvals, jvals, sigma, dw, dc)
        Df, Ef, sdiag = self._equilibrate(D, E)
        Ld, Ls, ok = self._chol_blocktri(Df, Ef)
        s_flat = sdiag.reshape(-1)

        perm = jnp.asarray(self.perm)
        invp = jnp.asarray(self.inv)

        def chol_solve(rhs_n):
            # permute: rhs_new[i] = rhs[perm[i]]; pad to n_pad; apply the
            # Jacobi scaling on both sides: x = S solve(S K S) S rhs
            rhs_p = jnp.zeros(self.n_pad, dtype=self.dtype)
            rhs_p = rhs_p.at[jnp.arange(n)].set(rhs_n[perm])
            x_p = self._solve_blocktri(Ld, Ls, rhs_p * s_flat)
            return (x_p.astype(self.dtype) * s_flat)[invp]

        rhs = r1 + self._At_mv(avals, r2) / dc
        dv = chol_solve(rhs)
        dy = (self._A_mv(avals, dv) - r2) / dc

        # iterative refinement on the regularized augmented system
        def residuals(dv, dy):
            Wdv = jnp.zeros(n, dtype=self.dtype).at[: s.nx].set(
                self._W_mv(hvals, dv[: s.nx])
            )
            e1 = r1 - (Wdv + (sigma + dw) * dv + self._At_mv(avals, dy))
            e2 = r2 - (self._A_mv(avals, dv) - dc * dy)
            return e1, e2

        def refine(carry, _):
            dv, dy = carry
            e1, e2 = residuals(dv, dy)
            cv = chol_solve(e1 + self._At_mv(avals, e2) / dc)
            cy = (self._A_mv(avals, cv) - e2) / dc
            return (dv + cv, dy + cy), None

        mixed = jnp.dtype(self.factor_dtype) != jnp.dtype(self.dtype)
        if not mixed:
            (dv, dy), _ = jax.lax.scan(
                refine, (dv, dy), None, length=self.ir_rounds
            )
            return dv, dy, ok & jnp.isfinite(dv).all()

        # Mixed precision: stationary refinement contracts at rate
        # eps_f32 * cond(K) — hopeless at IPM-tail conditioning. Krylov is
        # forgiving of a loose preconditioner (rate ~ sqrt(cond(M^-1 K))),
        # so run preconditioned CG on the condensed SPD operator with the
        # f32 block factor as M^-1; all vectors and mat-vecs (segment-sums,
        # exact on TPU) stay f64.
        def K_mv(v):
            Wv = jnp.zeros(n, dtype=self.dtype).at[: s.nx].set(
                self._W_mv(hvals, v[: s.nx])
            )
            return Wv + (sigma + dw) * v + self._At_mv(
                avals, self._A_mv(avals, v)
            ) / dc

        rhs_n2 = jnp.vdot(rhs, rhs)
        tol2 = (1e-13) ** 2 * rhs_n2

        def pcg_cond(c):
            _, r, _, rz, it_ = c
            return (jnp.vdot(r, r) > tol2) & (it_ < self.cg_maxiter) \
                & jnp.isfinite(rz)

        def pcg_body(c):
            v, r, p, rz, it_ = c
            Kp = K_mv(p)
            alpha = rz / jnp.vdot(p, Kp)
            v = v + alpha * p
            r = r - alpha * Kp
            z = chol_solve(r)
            rz_new = jnp.vdot(r, z)
            p = z + (rz_new / rz) * p
            return (v, r, p, rz_new, it_ + 1)

        r0 = rhs - K_mv(dv)
        z0 = chol_solve(r0)
        dv, r_fin, _, _, _ = jax.lax.while_loop(
            pcg_cond, pcg_body,
            (dv, r0, z0, jnp.vdot(r0, z0), jnp.asarray(0, jnp.int32)),
        )
        dy = (self._A_mv(avals, dv) - r2) / dc
        # certificate: factor succeeded AND the Krylov solve converged —
        # a slightly-indefinite matrix that slipped through the f32
        # Cholesky shows up as CG stagnation
        res_ok = jnp.vdot(r_fin, r_fin) <= jnp.maximum(
            self.cg_accept ** 2 * rhs_n2, 1e-24
        )
        pd_ok = ok & jnp.isfinite(dv).all() & res_ok
        return dv, dy, pd_ok

    def solve(self, hvals, jvals, sigma, dw, dc, r1, r2):
        return self._jit_solve(hvals, jvals, sigma, dw, dc, r1, r2)
