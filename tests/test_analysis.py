"""Differential tests of `cigwas_tpu.analysis` vs the reference's own
`cusk/scripts/bdpc.py` (importable in this image): identical pleiotropy
matrices/sets, parent/ancestor sets, PAG extractions, edge tallies, and
association tables on the same synthetic inputs.

The traversal rewrites are vectorized, so set/count equality against the
reference's queue-based walks is the parity contract.
"""

import importlib
import sys

import numpy as np
import pytest

REF_SCRIPTS = "/root/reference/cusk/scripts"


@pytest.fixture(scope="module")
def ref_bdpc():
    import matplotlib

    matplotlib.use("Agg")
    sys.path.insert(0, REF_SCRIPTS)
    try:
        mod = importlib.import_module("bdpc")
    finally:
        sys.path.remove(REF_SCRIPTS)
    return mod


NUM_P = 3


@pytest.fixture(scope="module")
def block_outputs(tmp_path_factory):
    """Three synthetic blocks in the reference file formats (one written
    absent to exercise the missing-block skip)."""
    tmp = tmp_path_factory.mktemp("bdpc")
    rng = np.random.default_rng(3)
    blockfile = tmp / "sim.blocks"
    specs = [("1", 0, 59, 12), ("1", 60, 99, 0), ("2", 0, 79, 9)]
    with open(blockfile, "w") as f:
        for chrom, a, b, _ in specs:
            f.write(f"{chrom}\t{a}\t{b}\n")
    # the reference's global_parent_sets has no missing-block tolerance
    # (bdpc.py:659-681 lacks the try/except its sibling has), so the
    # parent-set comparison uses a blockfile of present blocks only
    present_blockfile = tmp / "present.blocks"
    with open(present_blockfile, "w") as f:
        for chrom, a, b, num_m in specs:
            if num_m:
                f.write(f"{chrom}\t{a}\t{b}\n")
    outdir = tmp / "out"
    outdir.mkdir()
    for chrom, a, b, num_m in specs:
        if num_m == 0:
            continue  # missing block output
        n = num_m + NUM_P
        adj = np.zeros((n, n), np.int32)
        # random symmetric skeleton with phen-marker + marker-marker edges
        for _ in range(3 * n):
            i, j = rng.integers(0, n, 2)
            if i != j:
                adj[i, j] = adj[j, i] = 1
        corr = rng.normal(size=(n, n))
        corr = (((corr + corr.T) / 2) * adj).astype(np.float32)
        stem = str(outdir / f"{chrom}_{a}_{b}")
        with open(stem + ".mdim", "w") as f:
            f.write(f"{n}\t{NUM_P}\t3\n")
        adj.tofile(stem + ".adj")
        corr.tofile(stem + ".corr")
        np.full((n, n, 3), -1, np.int32).tofile(stem + ".sep")
        np.sort(
            rng.choice(b - a + 1, num_m, replace=False).astype(np.int32)
        ).tofile(stem + ".ixs")
    return str(blockfile), str(outdir) + "/", str(present_blockfile)


def _norm_counts(d):
    return {(int(k[0]), int(k[1])): int(v) for k, v in d.items()}


def _norm_sets(d):
    return {
        (int(k[0]), int(k[1])) if isinstance(k, tuple) else int(k):
        {int(x) for x in v}
        for k, v in d.items()
    }


@pytest.mark.parametrize("max_depth", [1, 2, np.inf])
def test_global_pleiotropy_mats_match_reference(ref_bdpc, block_outputs,
                                                max_depth):
    from cigwas_tpu import analysis

    blockfile, outdir, _ = block_outputs
    assert _norm_counts(
        analysis.global_epm(blockfile, outdir, max_depth=max_depth)
    ) == _norm_counts(ref_bdpc.global_epm(blockfile, outdir,
                                          max_depth=max_depth))
    assert _norm_counts(
        analysis.global_upm(blockfile, outdir, max_depth=max_depth)
    ) == _norm_counts(ref_bdpc.global_upm(blockfile, outdir,
                                          max_depth=max_depth))


def test_global_eps_matches_reference(ref_bdpc, block_outputs):
    from cigwas_tpu import analysis

    blockfile, outdir, _ = block_outputs
    # the reference's global_eps has no missing-block tolerance; give it
    # only present blocks by comparing per present block via its
    # BlockOutput (the global chain is covered by epm/upm above)
    ours = _norm_sets(analysis.global_eps(blockfile, outdir))
    marker_offset = 0
    theirs: dict = {}
    for stem in ref_bdpc.get_block_out_stems(blockfile):
        try:
            bo = ref_bdpc.BlockOutput(outdir + stem, marker_offset)
        except FileNotFoundError:
            continue
        marker_offset += bo.num_markers()
        for k, v in bo.exclusive_pleiotropy_sets().items():
            theirs.setdefault(k, set()).update(v)
    assert ours == _norm_sets(theirs)


@pytest.mark.parametrize("depth", [1, 2, 3])
def test_global_ancestor_and_parent_sets_match_reference(
    ref_bdpc, block_outputs, depth
):
    """depth=3 pins the reproduced queue-swap quirk (reference reach
    saturates at two marker hops, bdpc.py:852-860)."""
    from cigwas_tpu import analysis

    blockfile, outdir, present_bf = block_outputs
    ours = _norm_sets(analysis.global_ancestor_sets(blockfile, outdir,
                                                    depth=depth))
    theirs = _norm_sets(ref_bdpc.global_ancestor_sets(blockfile, outdir,
                                                      depth=depth))
    assert ours == theirs
    if depth == 1:
        assert _norm_sets(
            analysis.global_parent_sets(present_bf, outdir)
        ) == _norm_sets(ref_bdpc.global_parent_sets(present_bf, outdir))


@pytest.fixture(scope="module")
def pag_files(tmp_path_factory):
    from scipy.io import mmwrite
    from scipy.sparse import coo_matrix

    tmp = tmp_path_factory.mktemp("pag")
    rng = np.random.default_rng(5)
    num_phen, num_m = 4, 30
    n = num_phen + num_m
    pag = np.zeros((n, n), np.int64)
    marks = [(1, 1), (1, 2), (2, 1), (2, 2), (2, 3), (3, 2), (3, 3),
             (1, 3), (3, 1)]
    for _ in range(4 * n):
        i, j = rng.integers(0, n, 2)
        if i != j and pag[i, j] == 0:
            a, b = marks[rng.integers(len(marks))]
            pag[i, j], pag[j, i] = a, b
    pag_path = str(tmp / "pag.mtx")
    mmwrite(pag_path, coo_matrix(pag))
    pheno_path = str(tmp / "p.phen")
    with open(pheno_path, "w") as f:
        f.write("FID\tIID\t" + "\t".join(f"T{i}" for i in range(num_phen))
                + "\n")
    return pag_path, pheno_path, pag, num_phen


@pytest.mark.parametrize("depth", [1, 2])
def test_pag_pleiotropy_sets_match_reference(ref_bdpc, pag_files, depth):
    from cigwas_tpu import analysis

    pag_path, pheno_path, _, _ = pag_files
    ours = _norm_sets(analysis.pag_exclusive_pleiotropy_sets(
        pag_path, pheno_path, analysis.is_possible_child, depth))
    theirs = _norm_sets(ref_bdpc.pag_exclusive_pleiotropy_sets(
        pag_path, pheno_path, ref_bdpc.is_possible_child, depth))
    assert ours == theirs
    ours_c = _norm_sets(analysis.pag_exclusive_pleiotropy_sets(
        pag_path, pheno_path, analysis.is_child, depth))
    theirs_c = _norm_sets(ref_bdpc.pag_exclusive_pleiotropy_sets(
        pag_path, pheno_path, ref_bdpc.is_child, depth))
    assert ours_c == theirs_c


def test_pag_paths_and_tallies_match_reference(ref_bdpc, pag_files):
    from cigwas_tpu import analysis

    pag_path, pheno_path, pag, num_phen = pag_files
    # the reference's default max_path_len=inf never terminates
    # (bdpc.py:1682-1696); reachability saturates within num_phen hops,
    # so our inf result must equal its num_phen-bounded result
    np.testing.assert_array_equal(
        analysis.get_causal_paths(pag_path, pheno_path),
        ref_bdpc.get_causal_paths(pag_path, pheno_path,
                                  max_path_len=num_phen),
    )
    np.testing.assert_array_equal(
        analysis.get_causal_paths(pag_path, pheno_path, max_path_len=1),
        ref_bdpc.get_causal_paths(pag_path, pheno_path, max_path_len=1),
    )
    np.testing.assert_array_equal(
        analysis.get_possibly_causal_paths(pag_path, pheno_path),
        ref_bdpc.get_possibly_causal_paths(pag_path, pheno_path),
    )
    assert _norm_counts(
        analysis.pag_edge_types(pag_path, pheno_path)
    ) == _norm_counts(ref_bdpc.pag_edge_types(pag_path, pheno_path))
    assert _norm_counts(
        analysis.pag_x_to_y_edge_types(pag_path, pheno_path)
    ) == _norm_counts(ref_bdpc.pag_x_to_y_edge_types(pag_path, pheno_path))
    np.testing.assert_array_equal(
        analysis.pag_to_dag_directed(pag),
        ref_bdpc.pag_to_dag_directed(pag),
    )
    np.testing.assert_array_equal(
        analysis.pag_to_dag_possibly_directed(pag),
        ref_bdpc.pag_to_dag_possibly_directed(pag),
    )


def test_dag_helpers_match_reference(ref_bdpc):
    from cigwas_tpu import analysis

    rng = np.random.default_rng(9)
    adj = np.triu(rng.random((12, 12)) < 0.3, k=1).astype(np.float64)
    adj *= rng.normal(size=adj.shape)
    np.testing.assert_array_equal(
        analysis.make_adj_symmetric(adj), ref_bdpc.make_adj_symmetric(adj)
    )
    assert analysis.make_link_type_dict(adj) == ref_bdpc.make_link_type_dict(
        adj
    )
    np.testing.assert_array_equal(
        analysis.path_in_sem(adj), ref_bdpc.path_in_sem(adj)
    )


def test_marker_pheno_associations_match_reference(
    ref_bdpc, block_outputs, tmp_path
):
    from cigwas_tpu import analysis
    from cigwas_tpu.merge import merge_block_outputs

    blockfile, outdir, _ = block_outputs
    gm = merge_block_outputs(blockfile, outdir)
    stem = str(tmp_path / "merged")
    gm.write_mm(stem)
    n_bim = 200
    bim_path = str(tmp_path / "sim.bim")
    with open(bim_path, "w") as f:
        for i in range(n_bim):
            f.write(f"1\trs{i}\t0\t{1000 + i}\tA\tC\n")
    kw = dict(
        bim_path=bim_path, corr_path=stem + "_scm.mtx",
        adj_path=stem + "_sam.mtx", ixs_path=stem + ".ixs",
        num_phen=NUM_P,
    )
    ours = analysis.marker_pheno_associations(**kw)
    theirs = ref_bdpc.marker_pheno_associations(**kw)
    key = ["phenotype", "bim_line_ix"]
    ours = ours.sort_values(key).reset_index(drop=True)
    theirs = theirs.sort_values(key).reset_index(drop=True)
    assert ours.shape == theirs.shape
    for col in ["phenotype", "rsID", "bim_line_ix", "chr", "bp", "corr"]:
        np.testing.assert_array_equal(ours[col].values, theirs[col].values)


def test_plot_helpers_render(block_outputs, pag_files, tmp_path):
    """The plot entry points render on Agg without error (figure-level
    smoke; the numeric content is covered by the parity tests above)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from cigwas_tpu import analysis

    blockfile, outdir, _ = block_outputs
    pag_path, pheno_path, _, num_phen = pag_files
    with open(tmp_path / "p3.phen", "w") as f:
        f.write("FID\tIID\tT0\tT1\tT2\n")
    fig, ax = plt.subplots()
    analysis.plot_skeleton_pleiotropy_mat(
        outdir, blockfile, str(tmp_path / "p3.phen"), ax=ax)
    plt.close(fig)
    fig, ax = plt.subplots()
    analysis.plot_pag(pag_path, pheno_path, ax=ax)
    plt.close(fig)
    fig, ax = plt.subplots()
    analysis.plot_pleiotropy_mat(pag_path, pheno_path, ax=ax)
    plt.close(fig)
    z = analysis.get_skeleton_pleiotropy_mat(
        outdir, blockfile, str(tmp_path / "p3.phen"))
    assert z.shape == (NUM_P, NUM_P)
