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
"""

from __future__ import annotations

from functools import partial
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
    jitted obj/grad/cons/jac/hess evaluations with psum-reduced accumulation.

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

            def pad(a, fill=0):
                a = np.asarray(a)
                if a.ndim == 0 or a.shape[0] != n:
                    return a
                out = np.zeros((npad,) + a.shape[1:], dtype=a.dtype)
                out[:n] = a
                return out

            padded = {
                "vidx": pad(arrs["vidx"]),
                "pidx": pad(arrs["pidx"]),
                "data": tuple(pad(c) for c in arrs["data"]),
                "rows": pad(arrs["rows"]),
                "hdup": pad(arrs["hdup"]),
                "w": w,
            }
            return padded

        self._obj_pats = list(model._obj_pats)
        self._con_pats = list(model._con_pats)
        st = jax.device_get(model._static)
        self._arrs_obj = [pad_pattern(rt, a) for rt, a in zip(self._obj_pats, st["obj"])]
        self._arrs_con = [pad_pattern(rt, a) for rt, a in zip(self._con_pats, st["con"])]

        spec_elem = P(axis)
        self._sharded_obj = [
            self._shard_tree(a, spec_elem) for a in self._arrs_obj
        ]
        self._sharded_con = [
            self._shard_tree(a, spec_elem) for a in self._arrs_con
        ]

        self._jit_obj = self._build_obj()
        self._jit_grad = self._build_grad()
        self._jit_cons = self._build_cons()
        self._jit_jac = self._build_jac()
        self._jit_hess = self._build_hess()

    def _shard_tree(self, tree, spec):
        def put(a):
            a = jnp.asarray(a)
            if a.ndim >= 1:
                return jax.device_put(a, NamedSharding(self.mesh, P(self.axis)))
            return jax.device_put(a, NamedSharding(self.mesh, P()))

        return jax.tree_util.tree_map(put, tree)

    # -- helpers inside shard_map ------------------------------------------
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
        hfull = jax.vmap(jax.jacfwd(jax.grad(rt.eval_fn, argnums=0), argnums=0))(
            xg, arrs["data"], thg
        )
        hp_i, hp_j = rt.hp
        ent = hfull[:, hp_i, hp_j] * arrs["hdup"]
        return ent * arrs["w"][:, None]

    # -- jitted sharded oracles --------------------------------------------
    def _build_obj(self):
        mesh, axis = self.mesh, self.axis
        pats, arrs_spec = self._obj_pats, self._sharded_obj

        def impl(x, theta, *arrs):
            def local(x, theta, *arrs):
                tot = jnp.zeros((), dtype=self.dtype)
                for rt, a in zip(pats, arrs):
                    tot = tot + jnp.sum(self._local_vals(rt, a, x, theta))
                return jax.lax.psum(tot, axis)

            specs = tuple(
                jax.tree_util.tree_map(lambda _: P(axis), a) for a in arrs
            )
            fixed = [
                jax.tree_util.tree_map(
                    lambda v: P(axis) if v.ndim >= 1 else P(), a
                )
                for a in arrs
            ]
            return jax.shard_map(
                local, mesh=mesh,
                in_specs=(P(), P()) + tuple(fixed),
                out_specs=P(),
            )(x, theta, *arrs)

        jitted = jax.jit(impl)

        def run(x, theta=None):
            th = self.model.theta if theta is None else jnp.asarray(theta, self.dtype)
            return jitted(jnp.asarray(x, self.dtype), th, *arrs_spec)

        return run

    def _build_grad(self):
        mesh, axis = self.mesh, self.axis
        pats, arrs_spec = self._obj_pats, self._sharded_obj
        nvar = self.nvar

        def impl(x, theta, *arrs):
            def local(x, theta, *arrs):
                g = jnp.zeros(nvar, dtype=self.dtype)
                for rt, a in zip(pats, arrs):
                    if rt.p:
                        ent = self._local_grads(rt, a, x, theta)
                        g = g + jax.ops.segment_sum(
                            ent.reshape(-1), a["vidx"].reshape(-1), num_segments=nvar
                        )
                return jax.lax.psum(g, axis)

            fixed = [
                jax.tree_util.tree_map(
                    lambda v: P(axis) if v.ndim >= 1 else P(), a
                )
                for a in arrs
            ]
            return jax.shard_map(
                local, mesh=mesh,
                in_specs=(P(), P()) + tuple(fixed),
                out_specs=P(),
            )(x, theta, *arrs)

        jitted = jax.jit(impl)

        def run(x, theta=None):
            th = self.model.theta if theta is None else jnp.asarray(theta, self.dtype)
            return jitted(jnp.asarray(x, self.dtype), th, *arrs_spec)

        return run

    def _build_cons(self):
        mesh, axis = self.mesh, self.axis
        pats, arrs_spec = self._con_pats, self._sharded_con
        ncon = self.ncon

        def impl(x, theta, *arrs):
            def local(x, theta, *arrs):
                out = jnp.zeros(ncon, dtype=self.dtype)
                for rt, a in zip(pats, arrs):
                    vals = self._local_vals(rt, a, x, theta)
                    out = out + jax.ops.segment_sum(
                        vals, a["rows"], num_segments=ncon
                    )
                return jax.lax.psum(out, axis)

            fixed = [
                jax.tree_util.tree_map(
                    lambda v: P(axis) if v.ndim >= 1 else P(), a
                )
                for a in arrs
            ]
            return jax.shard_map(
                local, mesh=mesh,
                in_specs=(P(), P()) + tuple(fixed),
                out_specs=P(),
            )(x, theta, *arrs)

        jitted = jax.jit(impl)

        def run(x, theta=None):
            th = self.model.theta if theta is None else jnp.asarray(theta, self.dtype)
            return jitted(jnp.asarray(x, self.dtype), th, *arrs_spec)

        return run

    def _build_jac(self):
        """Per-pattern (padded_n, p) Jacobian entry blocks, element axis
        sharded end-to-end — no collective needed."""
        mesh, axis = self.mesh, self.axis
        pats, arrs_spec = self._con_pats, self._sharded_con

        def impl(x, theta, *arrs):
            def local(x, theta, *arrs):
                return tuple(
                    self._local_grads(rt, a, x, theta)
                    for rt, a in zip(pats, arrs)
                    if rt.p
                )

            fixed = [
                jax.tree_util.tree_map(
                    lambda v: P(axis) if v.ndim >= 1 else P(), a
                )
                for a in arrs
            ]
            return jax.shard_map(
                local, mesh=mesh,
                in_specs=(P(), P()) + tuple(fixed),
                out_specs=tuple(P(axis) for rt in pats if rt.p),
            )(x, theta, *arrs)

        jitted = jax.jit(impl)

        def run(x, theta=None):
            th = self.model.theta if theta is None else jnp.asarray(theta, self.dtype)
            return jitted(jnp.asarray(x, self.dtype), th, *arrs_spec)

        return run

    def _build_hess(self):
        mesh, axis = self.mesh, self.axis
        opats, oarrs = self._obj_pats, self._sharded_obj
        cpats, carrs = self._con_pats, self._sharded_con
        ncon = self.ncon

        def impl(x, y, obj_w, theta, *arrs):
            no = len(oarrs)
            a_obj, a_con = arrs[:no], arrs[no:]

            def local(x, y, obj_w, theta, *arrs):
                a_obj, a_con = arrs[:no], arrs[no:]
                outs = []
                for rt, a in zip(opats, a_obj):
                    if rt.o2step:
                        outs.append(obj_w * self._local_hess(rt, a, x, theta))
                for rt, a in zip(cpats, a_con):
                    if rt.o2step:
                        mult = y[a["rows"]]
                        outs.append(mult[:, None] * self._local_hess(rt, a, x, theta))
                return tuple(outs)

            fixed = [
                jax.tree_util.tree_map(
                    lambda v: P(axis) if v.ndim >= 1 else P(), a
                )
                for a in arrs
            ]
            n_out = sum(1 for rt in opats if rt.o2step) + sum(
                1 for rt in cpats if rt.o2step
            )
            return jax.shard_map(
                local, mesh=mesh,
                in_specs=(P(), P(), P(), P()) + tuple(fixed),
                out_specs=tuple(P(axis) for _ in range(n_out)),
            )(x, y, obj_w, theta, *arrs)

        jitted = jax.jit(impl)

        def run(x, y=None, obj_weight=1.0, theta=None):
            th = self.model.theta if theta is None else jnp.asarray(theta, self.dtype)
            yv = jnp.zeros(ncon, dtype=self.dtype) if y is None else jnp.asarray(y, self.dtype)
            return jitted(
                jnp.asarray(x, self.dtype), yv,
                jnp.asarray(obj_weight, self.dtype), th, *(oarrs + carrs)
            )

        return run
