"""Hand-built fixtures pinning merge-block quirks and resilience behavior.

* trait–trait edge intersection off-by-one (`merge_blocks.py:336-345`): the
  reference iterates 0-based trait indices against 1-based sparse keys, so
  edges touching the LAST trait are never intersection-checked (unioned).
* missing-block tolerance (`merge_blocks.py:371-391`): absent block outputs
  are skipped with a warning while global .bim offsets stay correct.
"""

import numpy as np
import pytest

from cigwas_tpu.io.results import ReducedGCS
from cigwas_tpu.merge.merge_blocks import merge_block_outputs


def _write_block(outdir, stem, num_m, num_p, edges, marker_rel_ixs, max_level=14):
    """Write a minimal `.mdim/.ixs/.adj/.corr/.sep` block output.

    edges are dense-index pairs (markers first, then traits); corr value for
    every edge is 0.5, diagonal 1.
    """
    n = num_m + num_p
    G = np.zeros((n, n), np.int32)
    C = np.eye(n, dtype=np.float32)
    for i, j in edges:
        G[i, j] = G[j, i] = 1
        C[i, j] = C[j, i] = 0.5
    ixs = np.zeros(n, dtype=np.int32)
    ixs[:num_m] = np.asarray(marker_rel_ixs, dtype=np.int32)
    gcs = ReducedGCS(
        num_var=n,
        num_phen=num_p,
        max_level=max_level,
        new_to_old_indices=ixs,
        G=G,
        C=C,
        S=np.full((n, n, max_level), -1, dtype=np.int32),
    )
    gcs.to_file(str(outdir / stem))


def _write_blockfile(path, blocks):
    with open(path, "w") as f:
        for chrom, first, last in blocks:
            f.write(f"{chrom}\t{first}\t{last}\n")


def test_trait_intersection_off_by_one(tmp_path):
    """Trait–trait edges not present in every block are deleted — except
    edges touching the last trait, which the reference's 0-based loop never
    checks (`add_sam`, `merge_blocks.py:336-345`)."""
    num_p = 3
    # dense layout per block: markers 0..1, traits 2..4 (global traits 1..3)
    # block A has ALL trait-trait edges; block B has none
    trait_edges = [(2, 3), (3, 4), (2, 4)]
    _write_block(
        tmp_path, "1_0_9", 2, num_p, trait_edges + [(0, 2)], [1, 7]
    )
    _write_block(tmp_path, "1_10_19", 2, num_p, [(0, 3)], [0, 4])
    bf = tmp_path / "test.blocks"
    _write_blockfile(bf, [("1", 0, 9), ("1", 10, 19)])

    res = merge_block_outputs(str(bf), str(tmp_path))

    # (1,2): both traits < num_p in the 0-based loop -> intersected -> gone
    assert (1, 2) not in res.sam and (2, 1) not in res.sam
    # edges touching trait 3 (the last trait) are never checked -> survive
    assert (2, 3) in res.sam and (3, 2) in res.sam
    assert (1, 3) in res.sam and (3, 1) in res.sam


def test_missing_block_skipped_with_correct_offsets(tmp_path, capsys):
    """Deleting one block's outputs must warn and keep both the selected-
    marker offsets and the global .bim offsets of later blocks correct
    (`merge_blocks.py:371-391`)."""
    num_p = 2
    _write_block(tmp_path, "1_0_9", 2, num_p, [(0, 2), (1, 3)], [1, 7])
    _write_block(tmp_path, "1_10_19", 2, num_p, [(0, 2)], [3, 5])
    _write_block(tmp_path, "1_20_29", 2, num_p, [(0, 3), (1, 2)], [0, 4])
    bf = tmp_path / "test.blocks"
    _write_blockfile(bf, [("1", 0, 9), ("1", 10, 19), ("1", 20, 29)])

    full = merge_block_outputs(str(bf), str(tmp_path))
    # traits 1..2; block A markers 3,4 at bim rows 1,7; block B 5,6 at 13,15;
    # block C 7,8 at 20,24
    assert full.gmi == {3: 1, 4: 7, 5: 13, 6: 15, 7: 20, 8: 24}

    # now delete the MIDDLE block's output files
    for suffix in (".mdim", ".ixs", ".adj", ".corr", ".sep"):
        (tmp_path / ("1_10_19" + suffix)).unlink()
    capsys.readouterr()
    res = merge_block_outputs(str(bf), str(tmp_path))
    out = capsys.readouterr().out
    assert "Missing:" in out and "1_10_19" in out

    # block C's selected markers now take sparse slots 5,6 but their global
    # .bim rows still account for the missing block's 10 markers
    assert res.gmi == {3: 1, 4: 7, 5: 20, 6: 24}
    assert res.num_var == 4 + num_p
    # block C's marker edges survive under the shifted sparse indices:
    # dense (0 -> sparse 5, 3 -> trait 2), (1 -> 6, 2 -> trait 1)
    assert (5, 2) in res.sam and (6, 1) in res.sam


def test_first_block_missing_drops_trait_edges(tmp_path, capsys):
    """If block 0 is missing, the accumulator starts empty and `add_sam`
    never inserts trait-trait edges (reference `merge_blocks.py:361-380`) —
    except, by the same 1-based-key off-by-one, edges whose key touches
    `num_p` (the last trait), which pass the `>= num_p` insertion filter."""
    num_p = 3
    # dense layout: markers 0..1, traits 2..4 (global traits 1..3)
    _write_block(tmp_path, "1_10_19", 2, num_p, [(0, 2), (2, 3), (3, 4)], [3, 5])
    bf = tmp_path / "test.blocks"
    _write_blockfile(bf, [("1", 0, 9), ("1", 10, 19)])

    res = merge_block_outputs(str(bf), str(tmp_path))
    # trait-trait (1,2): both keys < num_p -> never inserted
    assert (1, 2) not in res.sam and (2, 1) not in res.sam
    # trait-trait (2,3): key 3 == num_p passes the >= num_p filter -> inserted
    assert (2, 3) in res.sam and (3, 2) in res.sam
    assert (4, 1) in res.sam  # marker edge kept (sparse marker ix 4)
    assert res.gmi == {4: 13, 5: 15}
