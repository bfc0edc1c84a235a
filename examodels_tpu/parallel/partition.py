"""Network-partition sharding of a SINGLE large NLP across devices.

The scenario-Schur backend (solver/schur.py) factors any block-arrowhead
KKT: P local diagonal blocks + a shared border/corner, batched Cholesky
over the block axis sharded on a `Mesh`. Two-stage models get that
structure for free from `EachScenario` tags. This module manufactures the
same tags for an arbitrary single NLP — e.g. one 9241-bus AC-OPF — so a
problem too big for one chip solves over N devices with the SAME solver:

    model = ac_opf_model(2000)
    partition_model(model, nparts=8)            # tags, in place
    r = madipm(model, linear_solver="schur",
               mesh=Mesh(jax.devices(), ("scen",)))

Algorithm (host, build time — the symbolic phase):
  1. build the column-interaction graph of the condensed KKT matrix
     K = W + Σ + AᵀA/δc over the x columns: Hessian pattern ∪ (JᵀJ)
     pattern (every constraint row couples its columns pairwise);
  2. reverse-Cuthill-McKee order it (the same bandwidth-compression step
     the blocktri backend uses — power grids, chained NLPs and
     discretized-control graphs all order near-banded);
  3. cut the RCM order into `nparts` contiguous equal chunks;
  4. move every vertex with a neighbor in a different chunk into the
     SEPARATOR (tag 0). After this no K entry couples two parts — rows and
     Hessian entries are then provably local-or-separator, which is
     exactly the invariant `scenario_partition` checks;
  5. tag each constraint row with the single part its non-separator
     columns live in (0 if it only touches separator columns).

The separator size is what bounds the replicated work (the n0×n0
first-stage Schur corner): for a banded graph it is ≤ 2·bandwidth·nparts.
`partition_model` warns when the separator exceeds `max_sep_frac` of n —
the problem graph then has no small cuts and network partitioning will not
pay (use the blocktri or CG backend instead).

The reference has no analogue (its parallelism is one-GPU-thread-per-
element, SURVEY.md §2.6); this is the "network partitions of AC-OPF"
sharding axis of the north star (SURVEY §5 comm points (2)-(3)).
"""

from __future__ import annotations

import warnings

import numpy as np

__all__ = ["partition_tags", "partition_model"]


def partition_tags(model, nparts: int, *, structure=None,
                   max_sep_frac: float = 0.25):
    """Compute (var_scen, con_scen) int64 tag arrays mapping `model`'s
    columns/rows onto `nparts` arrowhead blocks (tags 1..nparts) plus a
    separator (tag 0). Pure function of the model's fixed sparsity."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    from ..solver.kkt import build_structure

    s = structure if structure is not None else build_structure(model)
    nx, m = s.nx, s.m
    P = int(nparts)
    if P < 1:
        raise ValueError("nparts must be >= 1")
    if P == 1:
        return np.ones(nx, np.int64), np.ones(m, np.int64)

    # ---- column-interaction graph over x ------------------------------
    # Hessian couplings
    gi = [s.hrows.astype(np.int64)]
    gj = [s.hcols.astype(np.int64)]
    # JᵀJ couplings without forming per-row cliques entry-by-entry:
    # boolean J pattern (m, nx); (JᵀJ) has an entry wherever two columns
    # share a row. scipy's sparse matmul does this in C.
    J = sp.coo_matrix(
        (np.ones(len(s.jrows)), (s.jrows, s.jcols)), shape=(m, nx)
    ).tocsr()
    JtJ = (J.T @ J).tocoo()
    gi.append(JtJ.row.astype(np.int64))
    gj.append(JtJ.col.astype(np.int64))
    gi = np.concatenate(gi + [np.arange(nx)])
    gj = np.concatenate(gj + [np.arange(nx)])
    adj = sp.coo_matrix((np.ones(len(gi)), (gi, gj)), shape=(nx, nx)).tocsr()
    adj = ((adj + adj.T) > 0).astype(np.float64)

    # ---- RCM + contiguous chunks --------------------------------------
    order = np.asarray(reverse_cuthill_mckee(adj, symmetric_mode=True))
    pos = np.empty(nx, dtype=np.int64)
    pos[order] = np.arange(nx)
    part = (pos * P) // nx + 1  # 1..P, contiguous equal chunks in RCM order

    # ---- separator: a one-sided vertex cover of the cross edges -------
    # For each edge between two parts, move ONE endpoint into the
    # separator — the one closer (in RCM position) to a chunk boundary, so
    # for banded graphs the separator concentrates into thin bands at the
    # cuts instead of doubling up on both sides. One sweep covers every
    # cross edge (an edge with either endpoint in the separator is no
    # longer a part-to-part coupling).
    A = adj.tocoo()
    ij = A.row < A.col  # dedup symmetric edges
    ei, ej = A.row[ij], A.col[ij]
    cross = part[ei] != part[ej]
    ei, ej = ei[cross], ej[cross]
    bounds = np.arange(1, P) * nx // P  # chunk boundaries in RCM position
    dist = np.abs(pos[:, None] - bounds[None, :]).min(axis=1) if P > 1 \
        else np.zeros(nx)
    move_i = dist[ei] <= dist[ej]
    sep = np.zeros(nx, dtype=bool)
    sep[np.where(move_i, ei, ej)] = True
    var_scen = np.where(sep, 0, part).astype(np.int64)

    n_sep = int(sep.sum())
    if n_sep > max_sep_frac * nx:
        warnings.warn(
            f"partition separator is {n_sep}/{nx} columns "
            f"({n_sep / nx:.0%} > {max_sep_frac:.0%}): this graph has no "
            f"small cuts at nparts={P}; the replicated Schur corner will "
            "dominate. Prefer fewer parts or the blocktri/cg backend.",
            stacklevel=2,
        )

    # ---- row tags: the unique part among the row's columns ------------
    Jc = J.tocoo()
    rt = var_scen[Jc.col]
    # max part tag per row; rows touching two parts are impossible (their
    # columns would be adjacent in JᵀJ and both in the separator) — assert
    row_max = np.zeros(m, dtype=np.int64)
    np.maximum.at(row_max, Jc.row, rt)
    row_min = np.full(m, np.iinfo(np.int64).max, dtype=np.int64)
    nz = rt > 0
    np.minimum.at(row_min, Jc.row[nz], rt[nz])
    touched = np.zeros(m, dtype=bool)
    touched[Jc.row[nz]] = True
    if np.any(touched & (row_min != row_max)):
        raise AssertionError(
            "internal: a constraint row touches two parts after separator "
            "extraction — the JᵀJ clique construction is broken"
        )
    con_scen = np.where(touched, row_max, 0).astype(np.int64)
    return var_scen, con_scen


def partition_model(model, nparts: int, *, max_sep_frac: float = 0.25):
    """Tag `model` in place with a `nparts`-way arrowhead partition so the
    IPMs' `linear_solver="schur"` (auto-chosen for tagged models above the
    dense limit) factors it as batched per-part blocks — shardable over a
    `Mesh(("scen",))` like any two-stage model. Returns the model.

    Idempotent per nparts; re-call with a different nparts to re-partition
    (drops the solver's cached compiled loops for the old partition).
    """
    var_scen, con_scen = partition_tags(
        model, nparts, max_sep_frac=max_sep_frac
    )
    model._var_scen = var_scen
    model._con_scen = con_scen
    model.nscen = int(nparts)
    model.__dict__.pop("_ipm_device_cache", None)  # stale per-partition loops
    sizes = np.bincount(var_scen, minlength=nparts + 1)
    model.partition_info = {
        "nparts": int(nparts),
        "n_separator": int(sizes[0]),
        "block_cols_min": int(sizes[1:].min()),
        "block_cols_max": int(sizes[1:].max()),
    }
    return model
