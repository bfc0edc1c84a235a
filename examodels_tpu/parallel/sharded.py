"""Multi-device pattern evaluation via shard_map over a jax Mesh.

The reference has no distributed backend at all (SURVEY.md §2.6); its only
parallelism is one-GPU-thread-per-element. The TPU-native scale-out design:
the *pattern element axis* is the data-parallel axis — each pattern's data
arrays (vidx/pidx/data/rows) are sharded across the mesh, the primal x is
replicated, per-element derivative values are computed locally, and the only
communication is the reduction of targeted accumulations:

    obj        — local partial sums → psum
    grad       — local segment_sum into the *global* nvar vector → psum
    cons       — local segment_sum into the global ncon vector → psum
    jac/hess   — fully local (each element owns its fixed COO slots:
                 the invariant of /root/reference/src/nlp.jl:1528-1530 means
                 value arrays concatenate along the sharded element axis,
                 no communication)

This mirrors FSDP-style replicated-param + reduced-grad structurally, riding
ICI via XLA psum, and is the foundation for the two-stage scenario mesh axis.

SCOPE: this evaluator is the element-axis sharding *correctness dryrun* —
its `newton_step` assembles replicated dense (m+n)² systems, which is fine
for validating shardings on a virtual mesh and useless at 10k-bus scale.
Production multi-chip solving is solver-grade on BOTH axes:
  * scenario axis — `madipm(model, linear_solver="schur",
    mesh=parallel.scenario_mesh())` on a TwoStageModel: per-scenario KKT
    blocks factor on their own devices, first-stage Schur reductions psum
    over ICI (solver/schur.py);
  * network-partition axis — `parallel.partition_model(model, nparts)` tags
    a SINGLE large NLP (e.g. one big AC-OPF) by graph-partitioning its
    condensed-KKT sparsity, and the same arrowhead backend factors the
    per-part blocks across the mesh (parallel/partition.py; validated at
    1k-bus over the 8-device mesh in tests/test_partition.py).
`newton_step` remains a dryrun utility only.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["ShardedEvaluator", "make_mesh"]


def make_mesh(n_devices: Optional[int] = None, axis: str = "elem") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _pad_to(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k


class ShardedEvaluator:
    """Shards an ExaModel's pattern arrays over one mesh axis and exposes
    jitted obj/grad/cons/jac/hess evaluations with psum-reduced accumulation,
    plus a fused `newton_step` — one jit containing the shard_map'd
    derivative evaluation AND a (replicated) regularized KKT solve.

    Elements are padded to a multiple of the mesh size with zero-weight
    rows (weight column w ∈ {0,1} multiplies every contribution), so shapes
    stay static and sharding is even.
    """

    def __init__(self, model, mesh: Mesh, axis: str = "elem"):
        self.model = model
        self.mesh = mesh
        self.axis = axis
        self.nvar = model.nvar
        self.ncon = model.ncon
        self.dtype = model.dtype
        k = mesh.shape[axis]

        def pad_pattern(rt, arrs):
            n = rt.n
            npad = _pad_to(n, k)
            w = np.zeros(npad, dtype=np.float64)
            w[:n] = 1.0

            def pad(a):
                a = np.asarray(a)
                if a.ndim == 0 or a.shape[0] != n:
                    return a
                out = np.zeros((npad,) + a.shape[1:], dtype=a.dtype)
                out[:n] = a
                return out

            return {
                "vidx": pad(arrs["vidx"]),
                "pidx": pad(arrs["pidx"]),
                "data": tuple(pad(c) for c in arrs["data"]),
                "rows": pad(arrs["rows"]),
                "hdup": pad(arrs["hdup"]),
                "w": w,
            }

        self._obj_pats = list(model._obj_pats)
        self._con_pats = list(model._con_pats)
        st = jax.device_get(model._static)
        arrs_obj = [pad_pattern(rt, a) for rt, a in zip(self._obj_pats, st["obj"])]
        arrs_con = [pad_pattern(rt, a) for rt, a in zip(self._con_pats, st["con"])]

        def put(a):
            a = jnp.asarray(a)
            spec = P(axis) if a.ndim >= 1 else P()
            return jax.device_put(a, NamedSharding(mesh, spec))

        self.arrs_obj = [jax.tree_util.tree_map(put, a) for a in arrs_obj]
        self.arrs_con = [jax.tree_util.tree_map(put, a) for a in arrs_con]
        self._n_obj = len(self.arrs_obj)

        def specs_of(arrs):
            return [
                jax.tree_util.tree_map(
                    lambda v: P(axis) if v.ndim >= 1 else P(), a
                )
                for a in arrs
            ]

        self._in_specs = tuple(specs_of(self.arrs_obj) + specs_of(self.arrs_con))

        self._jit_obj = jax.jit(self._obj_impl)
        self._jit_grad = jax.jit(self._grad_impl)
        self._jit_cons = jax.jit(self._cons_impl)
        self._jit_hess = jax.jit(self._hess_impl)
        self._jit_step = jax.jit(self._newton_step_impl)

    # -- local (per-shard) math --------------------------------------------
    def _local_vals(self, rt, arrs, x, theta):
        xg = x[arrs["vidx"]]
        thg = theta[arrs["pidx"]]
        return jax.vmap(rt.eval_fn)(xg, arrs["data"], thg) * arrs["w"]

    def _local_grads(self, rt, arrs, x, theta):
        xg = x[arrs["vidx"]]
        thg = theta[arrs["pidx"]]
        g = jax.vmap(jax.grad(rt.eval_fn, argnums=0))(xg, arrs["data"], thg)
        return g * arrs["w"][:, None]

    def _local_hess(self, rt, arrs, x, theta):
        xg = x[arrs["vidx"]]
        thg = theta[arrs["pidx"]]
        if rt.hess_fn is not None:
            ent = jax.vmap(rt.hess_fn)(xg, arrs["data"], thg)
        else:
            hfull = jax.vmap(
                jax.jacfwd(jax.grad(rt.eval_fn, argnums=0), argnums=0)
            )(xg, arrs["data"], thg)
            hp_i, hp_j = rt.hp
            ent = hfull[:, hp_i, hp_j]
        return ent * arrs["hdup"] * arrs["w"][:, None]

    def _shmap(self, local, out_specs, *args):
        """shard_map with replicated non-array args and element-sharded
        pattern arrays appended."""
        n_lead = len(args)
        return jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(),) * n_lead + self._in_specs,
            out_specs=out_specs,
        )(*args, *self.arrs_obj, *self.arrs_con)

    def _split(self, arrs):
        return arrs[: self._n_obj], arrs[self._n_obj :]

    # -- impls (traced under jit) ------------------------------------------
    def _obj_impl(self, x, theta):
        def local(x, theta, *arrs):
            a_obj, _ = self._split(arrs)
            tot = jnp.zeros((), dtype=self.dtype)
            for rt, a in zip(self._obj_pats, a_obj):
                tot = tot + jnp.sum(self._local_vals(rt, a, x, theta))
            return jax.lax.psum(tot, self.axis)

        return self._shmap(local, P(), x, theta)

    def _grad_impl(self, x, theta):
        def local(x, theta, *arrs):
            a_obj, _ = self._split(arrs)
            g = jnp.zeros(self.nvar, dtype=self.dtype)
            for rt, a in zip(self._obj_pats, a_obj):
                if rt.p:
                    ent = self._local_grads(rt, a, x, theta)
                    g = g + jax.ops.segment_sum(
                        ent.reshape(-1), a["vidx"].reshape(-1),
                        num_segments=self.nvar,
                    )
            return jax.lax.psum(g, self.axis)

        return self._shmap(local, P(), x, theta)

    def _cons_impl(self, x, theta):
        def local(x, theta, *arrs):
            _, a_con = self._split(arrs)
            out = jnp.zeros(self.ncon, dtype=self.dtype)
            for rt, a in zip(self._con_pats, a_con):
                vals = self._local_vals(rt, a, x, theta)
                out = out + jax.ops.segment_sum(
                    vals, a["rows"], num_segments=self.ncon
                )
            return jax.lax.psum(out, self.axis)

        return self._shmap(local, P(), x, theta)

    def _jac_blocks_impl(self, x, theta):
        """Per-pattern (padded_n, p) Jacobian entries, sharded end-to-end."""
        def local(x, theta, *arrs):
            _, a_con = self._split(arrs)
            return tuple(
                self._local_grads(rt, a, x, theta)
                for rt, a in zip(self._con_pats, a_con)
                if rt.p
            )

        n_out = sum(1 for rt in self._con_pats if rt.p)
        return self._shmap(local, tuple(P(self.axis) for _ in range(n_out)), x, theta)

    def _hess_impl(self, x, y, obj_w, theta):
        def local(x, y, obj_w, theta, *arrs):
            a_obj, a_con = self._split(arrs)
            outs = []
            for rt, a in zip(self._obj_pats, a_obj):
                if rt.o2step:
                    outs.append(obj_w * self._local_hess(rt, a, x, theta))
            for rt, a in zip(self._con_pats, a_con):
                if rt.o2step:
                    mult = y[a["rows"]]
                    outs.append(mult[:, None] * self._local_hess(rt, a, x, theta))
            return tuple(outs)

        n_out = sum(1 for rt in self._obj_pats if rt.o2step) + sum(
            1 for rt in self._con_pats if rt.o2step
        )
        return self._shmap(
            local, tuple(P(self.axis) for _ in range(n_out)), x, y, obj_w, theta
        )

    def _newton_step_impl(self, x, y, theta, reg):
        """One primal-dual Newton-KKT step: shard_map'd derivative
        evaluation (dp over elements, psum reductions) + replicated dense
        regularized KKT solve. The multi-chip 'training step'."""
        g = self._grad_impl(x, theta)
        r = self._cons_impl(x, theta)
        jac_blocks = self._jac_blocks_impl(x, theta)
        hess_blocks = self._hess_impl(x, y, jnp.asarray(1.0, self.dtype), theta)

        n, m = self.nvar, self.ncon
        J = jnp.zeros((m, n), dtype=self.dtype)
        bi = 0
        for rt, a in zip(self._con_pats, self.arrs_con):
            if rt.p:
                ent = jac_blocks[bi]
                bi += 1
                rows = jnp.repeat(a["rows"], rt.p)
                cols = a["vidx"].reshape(-1)
                J = J.at[rows, cols].add(ent.reshape(-1))
        W = jnp.zeros((n, n), dtype=self.dtype)
        bi = 0
        for rt, a in list(zip(self._obj_pats, self.arrs_obj)) + list(
            zip(self._con_pats, self.arrs_con)
        ):
            if rt.o2step:
                ent = hess_blocks[bi]
                bi += 1
                hp_i, hp_j = rt.hp
                ri = a["vidx"][:, hp_i].reshape(-1)
                ci = a["vidx"][:, hp_j].reshape(-1)
                rr = jnp.maximum(ri, ci)
                cc = jnp.minimum(ri, ci)
                W = W.at[rr, cc].add(ent.reshape(-1))
        W = jnp.tril(W) + jnp.tril(W, -1).T

        K = jnp.block(
            [
                [W + reg * jnp.eye(n, dtype=self.dtype), J.T],
                [J, -reg * jnp.eye(m, dtype=self.dtype)],
            ]
        )
        rhs = jnp.concatenate([-(g + J.T @ y), -r])
        d = jnp.linalg.solve(K, rhs)
        return x + d[:n], y + d[n:], jnp.vdot(rhs, rhs)

    # -- public API --------------------------------------------------------
    def obj(self, x, theta=None):
        return self._jit_obj(self._x(x), self._th(theta))

    def grad(self, x, theta=None):
        return self._jit_grad(self._x(x), self._th(theta))

    def cons(self, x, theta=None):
        return self._jit_cons(self._x(x), self._th(theta))

    def hess_blocks(self, x, y=None, obj_weight=1.0, theta=None):
        yv = (
            jnp.zeros(self.ncon, dtype=self.dtype)
            if y is None
            else jnp.asarray(y, self.dtype)
        )
        return self._jit_hess(
            self._x(x), yv, jnp.asarray(obj_weight, self.dtype), self._th(theta)
        )

    def newton_step(self, x, y, theta=None, reg=1e-8):
        return self._jit_step(
            self._x(x),
            jnp.asarray(y, self.dtype),
            self._th(theta),
            jnp.asarray(reg, self.dtype),
        )

    def _x(self, x):
        return jnp.asarray(x, dtype=self.dtype)

    def _th(self, theta):
        return self.model.theta if theta is None else jnp.asarray(theta, self.dtype)
