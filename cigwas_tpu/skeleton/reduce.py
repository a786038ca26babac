"""Ancestor-subset selection and graph/correlation/sepset reduction.

Equivalents of `subset_variables`, `reduce_gcs`, `reduce_gc`
(`parent_set.cpp:8-238`). These are small host-side graph operations; the BFS
is vectorized over the marker adjacency with numpy boolean algebra instead of
per-trait queues.
"""

from __future__ import annotations

import numpy as np

from cigwas_tpu.io.results import ReducedGC, ReducedGCS


def subset_variables(
    G: np.ndarray, num_var: int, num_markers: int, max_depth: int
) -> np.ndarray:
    """Sorted indices of all traits plus markers reachable from any trait
    through marker-only paths of length <= max_depth.

    Matches `parent_set.cpp:8-53`: the BFS starts at each trait, expands only
    into marker nodes, and every trait is always kept.
    """
    G = np.asarray(G).reshape(num_var, num_var).astype(bool)
    keep_markers = np.zeros(num_markers, dtype=bool)
    # frontier: markers adjacent to any trait (depth 1), then marker-marker
    # expansion up to max_depth
    frontier = G[num_markers:, :num_markers].any(axis=0)
    visited = np.zeros(num_markers, dtype=bool)
    for _ in range(max_depth):
        new = frontier & ~visited
        if not new.any():
            break
        visited |= new
        keep_markers |= new
        frontier = G[:num_markers, :num_markers][new].any(axis=0)
    keep = np.concatenate([np.where(keep_markers)[0], np.arange(num_markers, num_var)])
    return np.sort(keep).astype(np.int32)


def reduce_gcs(
    G: np.ndarray,
    C: np.ndarray,
    S: np.ndarray,
    keep: np.ndarray,
    num_var: int,
    num_phen: int,
    max_level: int,
    index_map: np.ndarray | None = None,
) -> ReducedGCS:
    """Extract the kept-variable submatrices of G/C/S, remapping sepset
    entries to the new index space and dropping entries that point at removed
    variables (`parent_set.cpp:84-175`).

    S is indexed with stride ML=14 regardless of max_level (the reference
    hardcodes `* 14`, `parent_set.cpp:108`); the output sepsets have stride
    ``max_level``.
    """
    import jax

    keep = np.asarray(keep, dtype=np.int64)
    G = np.asarray(G).reshape(num_var, num_var)
    S = np.asarray(S).reshape(num_var, num_var, -1)
    k = keep.size

    old_to_new = np.full(num_var, -1, dtype=np.int32)
    old_to_new[keep] = np.arange(k, dtype=np.int32)

    Gr = G[np.ix_(keep, keep)].astype(np.int32)
    if isinstance(C, jax.Array):
        # device panel (possibly pad-extended beyond num_var): gather the
        # kept submatrix ON DEVICE and fetch only (k, k) — the full panel
        # never crosses the host link
        kd = jax.numpy.asarray(keep.astype(np.int32))
        Cr = np.asarray(C[kd[:, None], kd[None, :]]).astype(np.float32)
    else:
        C = np.asarray(C).reshape(num_var, num_var)
        Cr = C[np.ix_(keep, keep)].astype(np.float32)

    # S may be allocated narrower than the requested output stride (the
    # skeleton only allocates its own run's depth, see `skeleton`'s sepset
    # note); missing trailing slots are -1 by construction, so the output
    # pads with -1 up to ``max_level`` (the reference always carries the
    # full ML stride, `parent_set.cpp:108`)
    depth = min(S.shape[2], max_level)
    Ssub = S[np.ix_(keep, keep)][:, :, :depth]  # (k, k, depth)
    valid = (Ssub != -1) & np.isin(Ssub, keep)
    Sr = np.full((k, k, max_level), -1, dtype=np.int32)
    # compact valid entries to the front of each (i, j) row
    order = np.argsort(~valid, axis=2, kind="stable")
    Scomp = np.take_along_axis(Ssub, order, axis=2)
    vcomp = np.take_along_axis(valid, order, axis=2)
    mapped = np.where(vcomp, old_to_new[np.clip(Scomp, 0, num_var - 1)], -1)
    Sr[:, :, :depth] = mapped

    if index_map is not None:
        new_to_old = np.asarray(index_map, dtype=np.int32)[keep]
    else:
        new_to_old = keep.astype(np.int32)

    return ReducedGCS(
        num_var=k,
        num_phen=num_phen,
        max_level=max_level,
        new_to_old_indices=new_to_old,
        G=Gr,
        C=Cr,
        S=Sr,
    )


def reduce_gc(
    G: np.ndarray,
    C: np.ndarray,
    S: np.ndarray,
    keep: np.ndarray,
    num_var: int,
    num_phen: int,
    max_level: int,
    index_map: np.ndarray | None = None,
) -> ReducedGC:
    """Like :func:`reduce_gcs` but S is the (num_var, num_var) ESS matrix
    (`parent_set.cpp:177-238`). C and S may be device arrays (possibly
    pad-extended beyond num_var): the kept submatrices are gathered ON
    DEVICE and only (k, k) blocks are fetched — the device-resident
    cuskss flow never moves the full panels over the host link."""
    import jax

    keep = np.asarray(keep, dtype=np.int64)
    G = np.asarray(G).reshape(num_var, num_var)
    k = keep.size

    def sub(M):
        if isinstance(M, jax.Array):
            kd = jax.numpy.asarray(keep.astype(np.int32))
            return np.asarray(M[kd[:, None], kd[None, :]]).astype(np.float32)
        return np.asarray(M).reshape(num_var, num_var)[
            np.ix_(keep, keep)
        ].astype(np.float32)

    if index_map is not None:
        new_to_old = np.asarray(index_map, dtype=np.int32)[keep]
    else:
        new_to_old = keep.astype(np.int32)
    return ReducedGC(
        num_var=k,
        num_phen=num_phen,
        max_level=max_level,
        new_to_old_indices=new_to_old,
        G=G[np.ix_(keep, keep)].astype(np.int32),
        C=sub(C),
        S=sub(S),
    )


def direct_x_to_y(G: np.ndarray, num_var: int, num_markers: int) -> np.ndarray:
    """Mark marker->trait edges with PAG codes 2/3 in place
    (`direct_x_to_y`, `parent_set.cpp:62-82`; unused in the reference's main
    path but part of its API surface)."""
    G = np.asarray(G).reshape(num_var, num_var)
    for sink in range(num_markers, num_var):
        for source in range(num_markers):
            if G[sink, source] == 1:
                G[source, sink] = 2
                G[sink, source] = 3
    return G
