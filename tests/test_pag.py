"""Tests of the R1-R10 PAG orientation port.

Hand-constructed PAGs with known rule firings (edge codes: 0 none, 1 circle,
2 arrowhead, 3 tail; apag[i, j] is the mark at j).
"""

import numpy as np
import pytest

from cigwas_tpu.pag.rfci import (
    estimate_pag,
    faith_check,
    min_discr_path,
    min_uncov_pd_path,
    rule1,
    rule2,
    rule8,
    rule9,
    triple2numb,
    udag2apag,
)


def edge(g, i, j, mark_at_j, mark_at_i):
    g[i, j] = mark_at_j
    g[j, i] = mark_at_i


def test_rule1_orients_unshielded_collider_tail():
    # a *-> b o-* c with a, c non-adjacent: orient b -> c (R1)
    g = np.zeros((3, 3), dtype=np.int32)
    edge(g, 0, 1, 2, 1)  # a o-> b
    edge(g, 1, 2, 1, 1)  # b o-o c
    out = rule1(g.copy(), set())
    assert out[1, 2] == 2 and out[2, 1] == 3


def test_rule1_respects_ambiguous_triples():
    g = np.zeros((3, 3), dtype=np.int32)
    edge(g, 0, 1, 2, 1)
    edge(g, 1, 2, 1, 1)
    p = 3
    unf = {triple2numb(p, 0 + 1, 1 + 1, 2 + 1)}
    out = rule1(g.copy(), unf)
    assert out[1, 2] == 1  # unchanged


def test_rule2_directed_path_forces_arrowhead():
    # a -> b *-> c and a o-* c: orient a *-> c
    g = np.zeros((3, 3), dtype=np.int32)
    edge(g, 0, 1, 2, 3)  # a -> b
    edge(g, 1, 2, 2, 1)  # b o-> c
    edge(g, 0, 2, 1, 1)  # a o-o c
    out = rule2(g.copy(), set())
    assert out[0, 2] == 2


def test_rule8_tail_completion():
    # a -> b -> c and a o-> c: orient a -> c (tail at a)
    g = np.zeros((3, 3), dtype=np.int32)
    edge(g, 0, 1, 2, 3)  # a -> b
    edge(g, 1, 2, 2, 3)  # b -> c
    edge(g, 0, 2, 2, 1)  # a o-> c
    out = rule8(g.copy(), set())
    assert out[2, 0] == 3


def test_rule9_uncovered_pd_path():
    # a o-> c plus an uncovered pd path a -> b -> d -> c: orient tail at a
    g = np.zeros((4, 4), dtype=np.int32)
    a, b, d, c = 0, 1, 2, 3
    edge(g, a, c, 2, 1)  # a o-> c
    edge(g, a, b, 2, 3)  # a -> b
    edge(g, b, d, 2, 3)  # b -> d
    edge(g, d, c, 2, 3)  # d -> c
    out = rule9(g.copy(), set())
    assert out[c, a] == 3


def test_min_uncov_pd_path_direct_triangle_rejected():
    # covered path must not count: a-b-c with a adjacent to c
    g = np.zeros((3, 3), dtype=np.int32)
    edge(g, 0, 1, 1, 1)
    edge(g, 1, 2, 1, 1)
    edge(g, 0, 2, 1, 1)
    assert min_uncov_pd_path(3, g, 0, 1, 2, set()) is None


def test_min_discr_path_simple():
    # classic discriminating path d *-> a <-> b o-* c, d -> c absent,
    # a -> c: path (d, a, b, c)
    g = np.zeros((4, 4), dtype=np.int32)
    d, a, b, c = 0, 1, 2, 3
    edge(g, d, a, 2, 1)  # d o-> a
    edge(g, a, b, 2, 2)  # a <-> b
    edge(g, b, c, 1, 2)  # b <-o c ... b is endpoint under test
    edge(g, a, c, 2, 3)  # a -> c
    res = min_discr_path(g, a, b, c)
    assert res == [d, a, b, c]


def test_faith_check_empty_unf_always_true():
    assert faith_check([0, 1, 2, 3], set(), 10)


def test_udag2apag_fixpoint_chain():
    # skeleton a o-o b o-o c with collider at b pre-oriented by sepselect:
    # a *-> b <-* c; R-rules should leave collider intact
    g = np.zeros((3, 3), dtype=np.int32)
    edge(g, 0, 1, 2, 1)
    edge(g, 2, 1, 2, 1)
    out = udag2apag(g, {})
    assert out[0, 1] == 2 and out[2, 1] == 2


def test_estimate_pag_end_to_end(tmp_path):
    """Drive the production driver on a tiny sepselect-style fileset."""
    from cigwas_tpu.io.binary import write_coo_mtx

    stem = str(tmp_path / "max_sep_min_pc")
    num_phen, num_var = 3, 5
    with open(stem + ".mdim", "w") as f:
        f.write(f"{num_var}\t{num_phen}\t2\t0\t1\n")
    # spm: traits 0,1,2; markers 3,4. v-structure 0 *-> 1 <-* 2 plus
    # marker-trait circles
    spm = np.zeros((num_var, num_var), dtype=np.int32)
    edge(spm, 0, 1, 2, 1)
    edge(spm, 2, 1, 2, 1)
    edge(spm, 3, 0, 1, 1)
    edge(spm, 4, 2, 1, 1)
    write_coo_mtx(stem + "_spm.mtx", spm, integer=True)
    with open(stem + ".ssm", "w") as f:
        f.write("1 3 2\n")  # sepset(0, 2) = {1} (1-based)
    np.zeros((0, 3), dtype=np.int32).tofile(stem + ".atr")
    np.array([[0, 1, 2]], dtype=np.int32).tofile(stem + ".ut")

    out = estimate_pag(stem, 1e-3, 10000, verbose=False)
    # marker->trait forced: marker rows get arrowheads, trait rows tails
    assert out[3, 0] == 2 and out[0, 3] == 3
    assert out[4, 2] == 2 and out[2, 4] == 3
    # collider marks preserved
    assert out[0, 1] == 2 and out[2, 1] == 2
    import os

    assert os.path.exists(stem + "_estimated_pag.mtx")


def test_find_unsh_triples():
    from cigwas_tpu.pag.simulations import find_unsh_triples

    adj = np.zeros((4, 4), dtype=np.int32)
    for i, j in [(0, 1), (1, 2), (2, 3)]:
        adj[i, j] = adj[j, i] = 1
    triples = find_unsh_triples(adj)
    assert (0, 1, 2) in triples and (1, 2, 3) in triples
    assert len(triples) == 2


def test_rfci_vstructures_orients_collider():
    """x -> z <- y collider: z not in sepset(x, y) -> arrowheads at z."""
    from cigwas_tpu.pag.simulations import rfci_vstructures

    rng = np.random.default_rng(0)
    n = 40000
    x = rng.normal(size=n)
    y = rng.normal(size=n)
    z = x + y + rng.normal(size=n)
    C = np.corrcoef(np.stack([x, y, z]))
    adj = np.array([[0, 0, 1], [0, 0, 1], [1, 1, 0]], dtype=np.int32)
    amat, sepset, _ = rfci_vstructures(adj, C, n, 1e-3, {(0, 1): set()})
    assert amat[0, 2] == 2 and amat[1, 2] == 2


def test_rfci_vstructures_deletes_spurious_edge():
    """chain x -> z -> y plus a spurious x-y edge in the skeleton: the
    re-test given sepset {z} removes it."""
    from cigwas_tpu.pag.simulations import rfci_vstructures

    rng = np.random.default_rng(1)
    n = 40000
    x = rng.normal(size=n)
    z = x + rng.normal(size=n)
    y = z + rng.normal(size=n)
    w = rng.normal(size=n)  # isolated-ish fourth node adjacent to x only
    C = np.corrcoef(np.stack([x, z, y, w]))
    adj = np.zeros((4, 4), dtype=np.int32)
    for i, j in [(0, 1), (1, 2), (0, 2), (0, 3)]:
        adj[i, j] = adj[j, i] = 1
    # triple (3, 0, 2): sepset(3, 2) = {0}? re-test of edge (0, 2)... build
    # a triple whose outer sepset separates the spurious edge:
    amat, sepset, _ = rfci_vstructures(
        adj, C, n, 1e-3, {(3, 2): {1}}, triples=[(3, 0, 2)]
    )
    # edge (2, 0) re-tested given {1} -> independent -> deleted
    assert amat[0, 2] == 0 and amat[2, 0] == 0


def test_estimate_pag_simulations_modes(tmp_path):
    from cigwas_tpu.constants import ML
    from cigwas_tpu.io.results import ReducedGCS
    from cigwas_tpu.pag.simulations import estimate_pag_simulations

    rng = np.random.default_rng(3)
    n = 20000
    # marker m0 -> trait t0 -> trait t1 (markers first in block layout)
    m0 = rng.normal(size=n)
    t0 = 0.5 * m0 + rng.normal(size=n)
    t1 = 0.7 * t0 + rng.normal(size=n)
    C = np.corrcoef(np.stack([m0, t0, t1])).astype(np.float32)
    G = np.array([[0, 1, 0], [1, 0, 1], [0, 1, 0]], dtype=np.int32)
    S = np.full((3, 3, ML), -1, dtype=np.int32)
    S[0, 2, 0] = 1  # sepset(m0, t1) = {t0}
    gcs = ReducedGCS(
        num_var=3, num_phen=2, max_level=ML,
        new_to_old_indices=np.arange(3, dtype=np.int32), G=G, C=C, S=S,
    )
    stem = str(tmp_path / "block")
    gcs.to_file(stem)
    np.zeros((0, 3), dtype=np.int32).tofile(stem + ".atr")
    for mode in ("std", "mpu", "mpd"):
        out = estimate_pag_simulations(stem, n, 1e-3, mode=mode, verbose=False)
        assert out.shape == (3, 3)
        import os

        assert os.path.exists(f"{stem}_estimated_pag_{mode}.mtx")
    # mpu forces marker -> trait at the end
    out = estimate_pag_simulations(stem, n, 1e-3, mode="mpu")
    assert out[0, 1] == 2 and out[1, 0] == 3


def test_udag2apag_sequential_diverges_from_order_independent():
    """Pins the two rule engines' semantics where rule order changes the
    output (`udag2apag` sequential, RFCI_functions_final.R:335 vs
    `udag2apag_ci_gwas`, :286). Setup: a1 o-> b o-o c <-o a3 with a1,c and
    a3,b non-adjacent. The sequential rule 1 orients b -> c from (a1, b)
    first, which removes c's circle at b before (a3, c) is considered. The
    snapshot engine matches both triples against the pass-start matrix, so
    the second match hits the already-arrowheaded edge and its
    conflicting-information arm yields b <-> c."""
    from cigwas_tpu.pag.rfci import udag2apag_sequential

    def build():
        g = np.zeros((4, 4), dtype=np.int32)
        g[0, 1], g[1, 0] = 2, 1  # a1 o-> b
        g[1, 2] = g[2, 1] = 1    # b o-o c
        g[3, 2], g[2, 3] = 2, 1  # a3 o-> c
        return g

    seq = udag2apag_sequential(build(), {}, rules=[True] + [False] * 9)
    fix = udag2apag(build(), {}, rules=[True] + [False] * 9)
    assert seq[1, 2] == 2 and seq[2, 1] == 3  # b -> c
    assert fix[1, 2] == 2 and fix[2, 1] == 2  # b <-> c
    assert not np.array_equal(seq, fix)


def test_udag2apag_sequential_rule1_chain():
    """A directed chain orients fully through the outer fixpoint, same as
    the snapshot engine, when no within-pass conflicts exist."""
    from cigwas_tpu.pag.rfci import udag2apag_sequential

    g = np.zeros((4, 4), dtype=np.int32)
    g[0, 1], g[1, 0] = 2, 3  # 0 -> 1
    g[1, 2] = g[2, 1] = 1
    g[2, 3] = g[3, 2] = 1
    seq = udag2apag_sequential(g.copy(), {})
    fix = udag2apag(g.copy(), {})
    assert np.array_equal(seq, fix)
    assert seq[1, 2] == 2 and seq[2, 1] == 3
    assert seq[2, 3] == 2 and seq[3, 2] == 3


def test_udag2apag_sequential_rule3_not_unf_quirk():
    """The SEQUENTIAL rule 3 orients when the triple is NOT ambiguous; the
    reference's order-independent rule3 has the opposite (quirk) condition
    (`rule3_order_indp`, RFCI_functions_final.R:64-67) and so never fires
    with an empty unfVect in conservative mode."""
    from cigwas_tpu.pag.rfci import rule3_seq, rule3

    def build():
        # a o-> b <-o c, a o-o d o-o c, d o-* b  => rule 3 orients d *-> b
        g = np.zeros((5, 5), dtype=np.int32)
        a, b, c, d = 0, 1, 2, 3
        g[a, b], g[b, a] = 2, 1
        g[c, b], g[b, c] = 2, 1
        g[a, d] = g[d, a] = 1
        g[c, d] = g[d, c] = 1
        g[d, b], g[b, d] = 1, 1
        return g

    unf_triple = {triple2numb(5, 0 + 1, 3 + 1, 2 + 1)}  # (a, d, c) ambiguous
    seq = rule3_seq(build(), set())
    assert seq[3, 1] == 2  # oriented with empty unf
    seq_unf = rule3_seq(build(), unf_triple)
    assert seq_unf[3, 1] == 1  # ambiguous triple blocks it
    fix = rule3(build(), set())
    assert fix[3, 1] == 1  # quirk: order-indp never orients on empty unf
    fix_unf = rule3(build(), unf_triple)
    assert fix_unf[3, 1] == 2  # quirk: only oriented when IS ambiguous
