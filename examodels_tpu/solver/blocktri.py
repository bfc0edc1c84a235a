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
                 cg_maxiter: int = 120, cg_accept: float = 1e-8,
                 hykkt_frac: float = 0.5, cg_inner_maxiter: int = 32,
                 hykkt_inner_tol: float = 3e-9):
        """`factor_dtype` (e.g. jnp.float32) factorizes in lower precision
        on the MXU with Jacobi equilibration, recovering accuracy via
        `ir_rounds` of iterative refinement in `dtype` — the mixed-precision
        strategy for TPUs whose f64 is emulated (v5e).

        `cg_maxiter`/`cg_accept` bound the mixed-precision Krylov recovery.
        `cg_accept` stays at the step-quality level the IPM can absorb;
        tightening it converts borderline-but-usable steps into
        δw-inflation rejections (measured: camshape-60 f32 stalls with
        1e-11 where 1e-8 converges).

        `hykkt_frac` ∈ (0, 1) selects the mixed-precision dual recovery:
        Golub–Greif/HyKKT. The condensed recovery dy = (A·dv − r2)/δc is a
        measured poison path: any condensed-solve residual lands in the
        duals amplified by 1/δc (10k-bus AC-OPF, δc=1e-5: dual_inf ~3e4 =
        prim_inf/δc, scaling exactly 1/δc across δc sweeps, while 2000-bus
        converged — the round-4 open problem). HyKKT instead augments with
        γ = hykkt_frac/δc < 1/δc, factors  H_γ = W + Σ + δw + γAᵀA  (same
        block-tri structure; only the AᵀA coefficient changes), and solves

            M dy = A H_γ⁻¹ (r1 + γAᵀr2) − r2,   M = ω·A H_γ⁻¹ Aᵀ + δc I,
            dv   = H_γ⁻¹ (r1 + γAᵀr2 − ω Aᵀ dy),          ω = 1 − γδc

        by CG on M. Since H_γ ⪰ γAᵀA, the Schur operator satisfies
        S = A H_γ⁻¹ Aᵀ ⪯ (1/γ) I, so λ(M) ∈ [δc, δc(1 + ω/hykkt_frac)]:
        cond(M) ≤ 1 + ω/κ (= 2 at κ = 0.5) INDEPENDENT of the problem —
        CG converges in a handful of iterations and no quantity is ever
        divided by δc. Each M·p application solves with H_γ via a short
        PCG run entirely in the equilibrated f32 "hat" space (dense
        block-tridiagonal mat-vecs + the f32 factor as preconditioner,
        f64-accumulated dots; `cg_inner_maxiter` cap) — on TPU the
        emulated-f64 COO mat-vec costs 10x the f32 backsolve, so keeping
        Krylov out of f64 is most of the speed. hykkt_frac=0 restores the
        legacy condensed recovery (kept for A/B measurement)."""
        self.s = structure
        self.dtype = dtype
        self.factor_dtype = factor_dtype or dtype
        self.ir_rounds = ir_rounds if factor_dtype is None else max(ir_rounds, 6)
        self.cg_maxiter = int(cg_maxiter)
        self.cg_accept = float(cg_accept)
        self.hykkt_frac = float(hykkt_frac)
        self.cg_inner_maxiter = int(cg_inner_maxiter)
        self.hykkt_inner_tol = float(hykkt_inner_tol)
        # TPU MXU f32 "dots" default to ONE bf16 pass (~8 mantissa bits).
        # The equilibrated off-diagonal blocks stay ~0.95 at ANY δw (the
        # AᵀA/δc term dominates the diagonal), so a bf16-quality Schur
        # update D_k − C Cᵀ loses PD to the ~8e-3 matmul error at block 1
        # and the whole factor NaNs (measured at 2000-bus: every recovery
        # exits unconverged at every δw on TPU while the identical f32
        # factor on CPU — true IEEE f32 — preconditions fine). The CHAIN
        # therefore runs at float32 dot precision. The SWEEPS only apply
        # the preconditioner — noise there costs Krylov iterations, not
        # correctness — so their precision is tunable separately (cost on
        # the MXU: default=1 pass, bfloat16_3x=3, float32≈6).
        # (jnp.linalg.cholesky / solve_triangular are precision-robust on
        # TPU independent of this setting — measured 1.6e-7 relative at
        # b=1216 under the default; only the raw matmuls need forcing.)
        self.factor_matmul_precision = "float32"
        # the X3 dot algorithm is a TPU-only enum (the CPU elemental IR
        # emitter rejects it); CPU f32 dots are true IEEE f32 already
        self.sweep_matmul_precision = (
            "float32" if jax.default_backend() == "tpu"
            else "default"
        )
        # fallback static-pivot shift = mult * eps(factor_dtype) on the
        # equilibrated diagonal, used only when the UNSHIFTED chain NaNs
        # (see _factor_mixed): large enough to keep the f32 chain PD at
        # small δw (measured: 2·eps NaNs, 16·eps factors at 2000-bus
        # dw=1e-4), small enough not to cap the preconditioner harder than
        # necessary (PCG stall level scales with shift · cond(K̂))
        self.static_shift_eps_mult = 16.0
        # always use the shifted factor (skip the unshifted attempt):
        # for A/B experiments and tests that need the weak-preconditioner
        # regime deterministically
        self.force_static_shift = False
        # when True, solve() returns (dv, dy, pd_ok, n_backsolves) so the
        # device loop / profiler can account Krylov work (trace-time static)
        self.report_stats = False
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

    def _assemble(self, hvals, jvals, sigma, dw, ata_coeff):
        """Scatter all value sources into (D, E) block storage for
        K = W + Σ + δw I + ata_coeff·AᵀA  (ata_coeff = 1/δc condensed,
        γ = hykkt_frac/δc for the HyKKT factor)."""
        b, nb = self.b, self.nb
        avals = self._avals(jvals)
        pair_vals = (
            jnp.asarray(self._pair_coeff, dtype=self.dtype)
            * avals[self._pair_k1] * avals[self._pair_k2] * ata_coeff
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
        blocks cast to factor_dtype. No shift here — static pivoting is
        applied (when needed) by `_factor_mixed`'s shift-pair."""
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
        return Ds, Es, s

    def _factor_mixed(self, Ds, Es):
        """Shift-pair mixed-precision factorization.

        The f32 Schur chain loses PD to f32-storage roundoff when the
        scaled λmin sits below ~eps32·(chain growth); a static-pivot shift
        ε·I keeps it factorable but CAPS the preconditioner quality — PCG
        stalls at the shift·cond(K̂) level (measured at 2000-bus, dw=1:
        shift=256·eps stalls at 2e-1 after 120 iterations, shift=0
        converges 1e-8 in 24). The shift is only NEEDED when δw is small
        (measured: dw=1e-4 NaNs at shift ≤ 2·eps, factors at 16·eps). So:
        factor BOTH ways — unshifted, and with static_shift_eps_mult·eps —
        and keep the unshifted factor whenever its chain survived. Factor
        cost is ~2x (≈ 50 ms per factor at 2000-bus, X3 precision) against
        Krylov sweeps that dominate the solve; the payoff is the fast
        preconditioner on exactly the iterations that can use it."""
        b = self.b
        shift = self.static_shift_eps_mult * float(
            jnp.finfo(self.factor_dtype).eps
        )
        eye = jnp.eye(b, dtype=self.factor_dtype)
        if self.force_static_shift:
            return self._chol_blocktri(Ds + shift * eye, Es)
        Ld0, Ls0, ok0 = self._chol_blocktri(Ds, Es)
        Ld1, Ls1, ok1 = self._chol_blocktri(Ds + shift * eye, Es)
        Ld = jnp.where(ok0, Ld0, Ld1)
        Ls = jnp.where(ok0, Ls0, Ls1) if Ls0.shape[0] else Ls0
        return Ld, Ls, ok0 | ok1

    def _chol_blocktri(self, D, E):
        """Block-tridiagonal Cholesky. Returns (Linv, L_sub, ok) where
        Linv[k] = L_k⁻¹ is materialized (one b×b triangular solve against I
        per block) so the subsequent forward/backward sweeps are pure
        matmuls — trisolves with vector right-hand sides are MXU-hostile,
        matvecs with L⁻¹ are not. Runs at factor_matmul_precision (see
        __init__: chain PD-ness dies at the TPU default)."""
        with jax.default_matmul_precision(self.factor_matmul_precision):
            return self._chol_blocktri_body(D, E)

    def _chol_blocktri_body(self, D, E):
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
        (matmul-only sweeps) at sweep_matmul_precision (preconditioner
        application: noise costs Krylov iterations, not correctness)."""
        with jax.default_matmul_precision(self.sweep_matmul_precision):
            return self._solve_blocktri_body(Linv, Ls, rhs)

    def _solve_blocktri_body(self, Linv, Ls, rhs):
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
        mixed = jnp.dtype(self.factor_dtype) != jnp.dtype(self.dtype)
        hykkt = mixed and self.hykkt_frac > 0.0
        avals = self._avals(jvals)
        # HyKKT factors H_γ (γ = κ/δc); condensed paths factor K (γ = 1/δc)
        gamma = (self.hykkt_frac / dc) if hykkt else (1.0 / dc)
        D, E = self._assemble(hvals, jvals, sigma, dw, gamma)
        Df, Ef, sdiag = self._equilibrate(D, E)
        if mixed:
            Ld, Ls, ok = self._factor_mixed(Df, Ef)
        else:
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

        def K_mv(v):
            # f64 mat-vec of the FACTORED matrix (H_γ or K): gathers +
            # segment-sums, exact on TPU
            Wv = jnp.zeros(n, dtype=self.dtype).at[: s.nx].set(
                self._W_mv(hvals, v[: s.nx])
            )
            return Wv + (sigma + dw) * v + gamma * self._At_mv(
                avals, self._A_mv(avals, v)
            )

        if not mixed:
            rhs = r1 + self._At_mv(avals, r2) / dc
            dv = chol_solve(rhs)
            dy = (self._A_mv(avals, dv) - r2) / dc

            # iterative refinement on the regularized augmented system
            def refine(carry, _):
                dv, dy = carry
                Wdv = jnp.zeros(n, dtype=self.dtype).at[: s.nx].set(
                    self._W_mv(hvals, dv[: s.nx])
                )
                e1 = r1 - (Wdv + (sigma + dw) * dv + self._At_mv(avals, dy))
                e2 = r2 - (self._A_mv(avals, dv) - dc * dy)
                cv = chol_solve(e1 + self._At_mv(avals, e2) / dc)
                cy = (self._A_mv(avals, cv) - e2) / dc
                return (dv + cv, dy + cy), None

            (dv, dy), _ = jax.lax.scan(
                refine, (dv, dy), None, length=self.ir_rounds
            )
            return dv, dy, ok & jnp.isfinite(dv).all(), jnp.asarray(
                self.ir_rounds, jnp.int32
            )

        # Mixed precision: stationary refinement contracts at rate
        # eps_f32 * cond(K) — hopeless at IPM-tail conditioning. Krylov is
        # forgiving of a loose preconditioner (rate ~ sqrt(cond(M^-1 K))),
        # so all recoveries below run f64 PCG with the f32 block factor as
        # the preconditioner; all vectors and mat-vecs stay f64.
        def pcg(b, x0, maxiter, tol_rel, accept_rel=None):
            """Preconditioned CG on the factored matrix: solve K_mv(x)=b.
            Returns (x, converged, iters); converged tests `accept_rel`
            (default cg_accept), looser than the tol_rel target since CG
            exits early once tol_rel is met."""
            b_n2 = jnp.vdot(b, b)
            tol2 = tol_rel ** 2 * b_n2
            accept_rel = self.cg_accept if accept_rel is None else accept_rel

            def cond_f(c):
                _, r, _, rz, it_ = c
                return (jnp.vdot(r, r) > tol2) & (it_ < maxiter) \
                    & jnp.isfinite(rz)

            def body_f(c):
                x, r, p, rz, it_ = c
                Kp = K_mv(p)
                alpha = rz / jnp.vdot(p, Kp)
                x = x + alpha * p
                r = r - alpha * Kp
                z = chol_solve(r)
                rz_new = jnp.vdot(r, z)
                p = z + (rz_new / rz) * p
                return (x, r, p, rz_new, it_ + 1)

            r0 = b - K_mv(x0)
            z0 = chol_solve(r0)
            x, r_f, _, _, its = jax.lax.while_loop(
                cond_f, body_f,
                (x0, r0, z0, jnp.vdot(r0, z0), jnp.asarray(0, jnp.int32)),
            )
            conv = jnp.vdot(r_f, r_f) <= jnp.maximum(
                accept_rel ** 2 * b_n2, 1e-24
            )
            return x, conv, its

        if not hykkt:
            # legacy condensed recovery (hykkt_frac=0): kept for A/B runs.
            # dy = (A·dv − r2)/δc amplifies the condensed residual by 1/δc.
            rhs = r1 + self._At_mv(avals, r2) / dc
            dv0 = chol_solve(rhs)
            dv, res_ok, its = pcg(rhs, dv0, self.cg_maxiter, 1e-13)
            dy = (self._A_mv(avals, dv) - r2) / dc
            pd_ok = ok & jnp.isfinite(dv).all() & res_ok
            return dv, dy, pd_ok, its

        # ---- HyKKT / Golub-Greif dual recovery ---------------------------
        # (see __init__ docstring for the operator algebra and conditioning)
        # Acceptance is far looser than the condensed path's: nothing here
        # is divided by δc, so a 1e-5-relative Krylov residual yields a
        # 1e-5-relative step — absorbable by the line search — where the
        # condensed recovery needed 1e-8 BEFORE its 1/δc amplification.
        # This is the robustness payoff at tail conditioning: when the
        # factor preconditioner degrades, the condensed duals are garbage
        # (residual/δc) while HyKKT still delivers clean steps instead of
        # tripping the δw-inflation runaway.
        #
        # ALL Krylov iterations run in the equilibrated permuted f32 "hat"
        # space with DENSE block-tridiagonal mat-vecs (Df/Ef are already
        # assembled) and f64-accumulated dot products: the f64 COO mat-vec
        # is 55 ms at 2000-bus on TPU (emulated-f64 segment-sums) while the
        # f32 backsolve is 5 ms — the hat-space core removes the 90%
        # per-iteration cost. f64 appears only at entry/exit and in the
        # ~10 outer A/Aᵀ products. The f32 floor (~1e-6 relative) is what
        # sets the acceptance level; the hybrid's f64 polish carries the
        # solve below it.
        accept = max(self.cg_accept * 100.0, 1e-5)
        inner_tol = max(self.hykkt_inner_tol, 1e-7)
        omega = 1.0 - self.hykkt_frac
        rhs1 = r1 + gamma * self._At_mv(avals, r2)
        fdt = self.factor_dtype
        idx_n = jnp.arange(n)

        def to_hat(r64):
            rp = jnp.zeros(self.n_pad, self.dtype).at[idx_n].set(r64[perm])
            return (rp * s_flat).astype(fdt)

        def from_hat(z32):
            return (z32.astype(self.dtype) * s_flat)[invp]

        def Khat_mv(v32):
            # dense block-tridiag mat-vec of the scaled UNSHIFTED matrix
            with jax.default_matmul_precision(self.sweep_matmul_precision):
                vb = v32.reshape(self.nb, self.b)
                Y = jnp.einsum("kij,kj->ki", Df, vb)
                if self.nb > 1:
                    Y = Y.at[1:].add(
                        jnp.einsum("kij,kj->ki", Ef, vb[:-1])
                    )
                    Y = Y.at[:-1].add(
                        jnp.einsum("kji,kj->ki", Ef, vb[1:])
                    )
            return Y.reshape(-1)

        def fdot(a, c):
            # f64-accumulated dot of f32 vectors: pushes the f32 Krylov
            # floor to ~1e-7 at no matmul cost
            return jax.lax.dot_general(
                a, c, (((0,), (0,)), ((), ())),
                preferred_element_type=self.dtype,
            )

        def pcg_hat(b32, maxiter, tol_rel, accept_rel):
            """f32 PCG in hat space: solve K̂ x = b̂. Returns
            (x32, converged, iters)."""
            b_n2 = fdot(b32, b32)
            tol2 = tol_rel ** 2 * b_n2

            def cond_f(c):
                _, r, _, rz, it_ = c
                return (fdot(r, r) > tol2) & (it_ < maxiter) \
                    & jnp.isfinite(rz)

            def body_f(c):
                x, r, p, rz, it_ = c
                Kp = Khat_mv(p)
                alpha = (rz / fdot(p, Kp)).astype(fdt)
                x = x + alpha * p
                r = r - alpha * Kp
                z = self._solve_blocktri(Ld, Ls, r)
                rz_new = fdot(r, z)
                beta = (rz_new / rz).astype(fdt)
                p = z + beta * p
                return (x, r, p, rz_new, it_ + 1)

            x0 = self._solve_blocktri(Ld, Ls, b32)
            r0 = b32 - Khat_mv(x0)
            z0 = self._solve_blocktri(Ld, Ls, r0)
            x, r_f, _, _, its = jax.lax.while_loop(
                cond_f, body_f,
                (x0, r0, z0, fdot(r0, z0), jnp.asarray(0, jnp.int32)),
            )
            conv = fdot(r_f, r_f) <= jnp.maximum(
                accept_rel ** 2 * b_n2, jnp.asarray(1e-30, self.dtype)
            )
            return x, conv, its

        def Hinv(b64, maxiter):
            z, conv, its = pcg_hat(to_hat(b64), maxiter, inner_tol, accept)
            return from_hat(z), conv, its

        t, t_ok, t_its = Hinv(rhs1, self.cg_maxiter)
        b_dual = self._A_mv(avals, t) - r2
        bd_n2 = jnp.vdot(b_dual, b_dual)
        # cond(M) ≤ 1 + ω/κ ⇒ CG reaches its target in O(10) iters; the
        # target respects the hat-space matvec quality (inexact M·p at the
        # inner-solve level caps the reachable outer residual)
        outer_max = jnp.asarray(min(self.cg_maxiter, 40), jnp.int32)
        tol2_out = (0.1 * accept) ** 2 * bd_n2

        def M_apply(p):
            """ω·A H_γ⁻¹ Aᵀ p + δc p, with the H_γ solve via short inner
            hat-space PCG. Returns (Mp, w = H_γ⁻¹Aᵀp, its) — w is reused to
            build dv incrementally so no final H_γ solve is needed."""
            Atp = self._At_mv(avals, p)
            w, _, w_its = Hinv(Atp, self.cg_inner_maxiter)
            return omega * self._A_mv(avals, w) + dc * p, w, w_its

        def cg_cond(c):
            _, _, r, _, rz, it_, its = c
            # `its < cg_maxiter` bounds TOTAL inner-PCG work across the
            # dual CG (not just per-application): the worst case per KKT
            # solve stays ~2x cg_maxiter backsolves, so one IPM iteration
            # cannot run past a runtime dispatch watchdog
            return (jnp.vdot(r, r) > tol2_out) & (it_ < outer_max) \
                & (its < self.cg_maxiter) & jnp.isfinite(rz)

        def cg_body(c):
            dy, dvc, r, p, rz, it_, its = c
            Mp, w, w_its = M_apply(p)
            alpha = rz / jnp.vdot(p, Mp)
            dy = dy + alpha * p
            dvc = dvc + alpha * w  # accumulates H_γ⁻¹Aᵀ dy
            r = r - alpha * Mp
            rz_new = jnp.vdot(r, r)  # plain CG: M is near-identity scaled
            p = r + (rz_new / rz) * p
            return (dy, dvc, r, p, rz_new, it_ + 1, its + w_its)

        dy0 = jnp.zeros(s.m, dtype=self.dtype)
        dvc0 = jnp.zeros(n, dtype=self.dtype)
        rz0 = bd_n2
        dy, dvc, r_out, _, _, outer_its, inner_its = jax.lax.while_loop(
            cg_cond, cg_body,
            (dy0, dvc0, b_dual, b_dual, rz0, jnp.asarray(0, jnp.int32),
             jnp.asarray(0, jnp.int32)),
        )
        dual_ok = jnp.vdot(r_out, r_out) <= jnp.maximum(
            accept ** 2 * bd_n2, 1e-24
        )
        # dv = H_γ⁻¹(rhs1 − ωAᵀdy) = t − ω·(accumulated H_γ⁻¹Aᵀdy)
        dv = t - omega * dvc
        pd_ok = ok & jnp.isfinite(dv).all() & jnp.isfinite(dy).all() \
            & t_ok & dual_ok
        return dv, dy, pd_ok, t_its + inner_its + outer_its

    def solve(self, hvals, jvals, sigma, dw, dc, r1, r2):
        out = self._jit_solve(hvals, jvals, sigma, dw, dc, r1, r2)
        return out if self.report_stats else out[:3]
