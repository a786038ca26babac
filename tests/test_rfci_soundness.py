"""Differential validation of the R1-R10 orientation engine on nontrivial
graphs (VERDICT r1 weak item 7).

pcalg/R is not available in-image, so the oracle is definitional: for small
random DAGs we enumerate the full Markov equivalence class (all acyclic
orientations of the skeleton with identical unshielded colliders) and check
every mark `udag2apag` produces against it:

* an arrowhead at y on edge x *-> y asserts "y is not an ancestor of x in
  any member of the class",
* a tail at y on edge x --- y asserts "y is an ancestor of x in every
  member",
* the skeleton must be preserved, and
* the output must be R1-closed (no unshielded a *-> b o-o c left open) —
  a completeness floor on top of the soundness checks.

This covers the composition of R1-R10 (`RFCI_functions_final.R:286-333`)
far beyond the per-rule micro-cases in test_pag.py.
"""

import itertools

import numpy as np
import pytest

from cigwas_tpu.pag.rfci import udag2apag

CIRCLE, ARROW, TAIL = 1, 2, 3


def random_dag(rng, p, edge_prob):
    """Upper-triangular DAG with randomly permuted node labels."""
    A = (rng.random((p, p)) < edge_prob) & np.tri(p, k=-1, dtype=bool).T
    perm = rng.permutation(p)
    return A[np.ix_(perm, perm)]


def ancestors_closure(A):
    """Boolean (p, p): anc[i, j] = i is an ancestor of j (proper)."""
    p = A.shape[0]
    reach = A.copy()
    for _ in range(p):
        reach = reach | (reach @ A)
    return reach


def vstructures(A):
    """Set of unshielded colliders (i, k, j) with i < j and i -> k <- j."""
    p = A.shape[0]
    adj = A | A.T
    out = set()
    for k in range(p):
        pa = np.where(A[:, k])[0]
        for i, j in itertools.combinations(pa, 2):
            if not adj[i, j]:
                out.add((min(i, j), k, max(i, j)))
    return out


def is_acyclic(A):
    p = A.shape[0]
    reach = A.copy()
    for _ in range(p):
        reach = reach | (reach @ A)
    return not reach.diagonal().any()


def markov_equivalence_class(A):
    """All DAGs with A's skeleton and unshielded colliders (enumerated)."""
    p = A.shape[0]
    edges = [(i, j) for i in range(p) for j in range(i + 1, p) if A[i, j] or A[j, i]]
    target_v = vstructures(A)
    members = []
    for bits in itertools.product((0, 1), repeat=len(edges)):
        B = np.zeros_like(A)
        for (i, j), b in zip(edges, bits):
            if b:
                B[i, j] = True
            else:
                B[j, i] = True
        if is_acyclic(B) and vstructures(B) == target_v:
            members.append(B)
    assert members, "true DAG must be in its own class"
    return members


def build_initial_pag_and_sepsets(A):
    """PC output under a perfect oracle: skeleton circles + collider marks.

    Sepset of a non-adjacent pair (i, j): pa(i) if j is not a descendant of
    i, else pa(j) — a valid d-separator in a causally sufficient DAG.
    """
    p = A.shape[0]
    adj = A | A.T
    anc = ancestors_closure(A)
    sepset = {}
    for i in range(p):
        for j in range(i + 1, p):
            if not adj[i, j]:
                if not anc[i, j]:  # j is not a descendant of i
                    sepset[(i, j)] = set(np.where(A[:, i])[0])
                else:
                    sepset[(i, j)] = set(np.where(A[:, j])[0])
    pag = np.where(adj, CIRCLE, 0).astype(np.int32)
    for i, k, j in vstructures(A):
        pag[i, k] = ARROW
        pag[j, k] = ARROW
    return pag, sepset


@pytest.mark.parametrize("seed", range(12))
def test_udag2apag_marks_sound_vs_equivalence_class(seed):
    rng = np.random.default_rng(seed)
    p = 7
    A = random_dag(rng, p, edge_prob=0.35)
    if not (A | A.T).any():
        pytest.skip("empty graph")
    pag0, sepset = build_initial_pag_and_sepsets(A)
    out = udag2apag(pag0.copy(), sepset)

    adj = A | A.T
    # skeleton preserved (R4's edge deletion must not fire under a perfect
    # oracle on a sufficient DAG)
    assert ((out != 0) == adj).all(), "skeleton changed"

    members = markov_equivalence_class(A)
    ancs = [ancestors_closure(B) for B in members]
    for i in range(p):
        for j in range(p):
            if not adj[i, j]:
                continue
            mark_at_j = out[i, j]
            if mark_at_j == ARROW:
                for B, anc in zip(members, ancs):
                    assert not anc[j, i], (
                        f"arrowhead at {j} on {i}*->{j} but {j} is an "
                        f"ancestor of {i} in a class member"
                    )
            elif mark_at_j == TAIL:
                for B, anc in zip(members, ancs):
                    assert anc[j, i] or B[j, i], (
                        f"tail at {j} on {i}-{j} but {j} is not an ancestor "
                        f"of {i} in some class member"
                    )
            else:
                assert mark_at_j == CIRCLE

    # completeness floor: R1-closed output — every unshielded a *-> b o-*
    # must have been oriented
    for b in range(p):
        for a in range(p):
            if out[a, b] != ARROW:
                continue
            for c in range(p):
                if c in (a, b) or not adj[b, c] or adj[a, c]:
                    continue
                assert out[b, c] != CIRCLE or out[c, b] != CIRCLE, (
                    f"R1 not closed: {a}*->{b} o-o {c}"
                )


def test_udag2apag_collider_chain_cascades_r1():
    """Collider 0 *-> 2 <-* 1 with a tail chain 2-3-4: R1 must cascade the
    arrowheads down the chain (2->3, 3->4) with tails by R1's mark setting."""
    p = 5
    A = np.zeros((p, p), dtype=bool)
    A[0, 2] = A[1, 2] = A[2, 3] = A[3, 4] = True
    pag0, sepset = build_initial_pag_and_sepsets(A)
    out = udag2apag(pag0.copy(), sepset)
    # v-structure kept
    assert out[0, 2] == ARROW and out[1, 2] == ARROW
    # R1 cascade: 2 -> 3 -> 4 fully oriented with tails
    assert out[2, 3] == ARROW and out[3, 2] == TAIL
    assert out[3, 4] == ARROW and out[4, 3] == TAIL
