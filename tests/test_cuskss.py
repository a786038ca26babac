"""End-to-end cuskss integration tests.

Ports of `cusk/tests/cuskss_tests.cpp`: run the full summary-statistic
pipeline against the reference's checked-in input fixtures and assert the
exact golden `.adj/.ixs` and near-equal `.corr` outputs.
"""

import os

import numpy as np
import pytest

from cigwas_tpu.pipelines import CuskssArgs, cuskss

DATA = os.path.join(os.path.dirname(__file__), "data", "test_files")


def p(name: str) -> str:
    return os.path.join(DATA, name)


def _base_args(tmp_path, **overrides):
    kw = dict(
        mxm=p("small_mxm.bin"),
        mxp=p("marker_trait_summary_stats.txt"),
        pxp=p("trait_summary_stats.txt"),
        marker_indices=p("marker_indices.bin"),
        alpha=0.0001,
        num_samples=500000,
        max_level_one=3,
        max_level_two=1,
        max_depth=1,
        outdir=str(tmp_path),
    )
    kw.update(overrides)
    return CuskssArgs.from_paths(**kw)


def test_trait_only_merged_expected_results(tmp_path):
    """`cuskss.trait_only_merged_expected_results` (`cuskss_tests.cpp:31-81`)."""
    args = _base_args(tmp_path, mxm="NULL", max_level_two=0)
    cuskss(args, verbose=False)
    adj = np.fromfile(tmp_path / "trait_only.adj", dtype=np.int32)
    assert list(adj) == [0, 1, 1, 1, 0, 1, 1, 1, 0]
    corr = np.fromfile(tmp_path / "trait_only.corr", dtype=np.float32)
    exp_corr = [
        1.0,
        0.0608594558771734,
        0.074239793758568,
        0.0608594558771734,
        1.0,
        0.0675875270156859,
        0.074239793758568,
        0.0675875270156859,
        1.0,
    ]
    assert np.allclose(corr, exp_corr, atol=1e-3)


EXP_IXS = [2, 3, 4, 5]
EXP_ADJ = [0, 0, 0, 1, 0, 0, 1, 1, 0, 1, 0, 1, 1, 1, 1, 0]
EXP_CORR = [
    1.0,
    0.0005,
    0.0001,
    -0.01,
    0.0005,
    1.0,
    0.0608594558771734,
    0.074239793758568,
    0.0001,
    0.0608594558771734,
    1.0,
    0.0675875270156859,
    -0.01,
    0.074239793758568,
    0.0675875270156859,
    1.0,
]


def test_pearson_two_stage_merged_expected_results(tmp_path):
    """`cuskss.pearson_two_stage_merged_expected_results`
    (`cuskss_tests.cpp:83-148`)."""
    args = _base_args(tmp_path)
    cuskss(args, verbose=False)
    ixs = np.fromfile(tmp_path / "cuskss_merged.ixs", dtype=np.int32)
    assert list(ixs) == EXP_IXS
    adj = np.fromfile(tmp_path / "cuskss_merged.adj", dtype=np.int32)
    assert list(adj) == EXP_ADJ
    corr = np.fromfile(tmp_path / "cuskss_merged.corr", dtype=np.float32)
    assert np.allclose(corr, EXP_CORR, atol=1e-3)


def test_pearson_two_stage_block_expected_results(tmp_path):
    """`cuskss.pearson_two_stage_block_expected_results`
    (`cuskss_tests.cpp:150-210`)."""
    args = _base_args(
        tmp_path,
        marker_indices="NULL",
        blockfile=p("blocks.txt"),
        block_index=0,
        time_index=p("time_index.txt"),
    )
    # note: the reference passes a time_index_path but time_indexed=false in
    # the struct, so the file is ignored there; we mirror by not passing it
    args.time_indexed = False
    cuskss(args, verbose=False)
    ixs = np.fromfile(tmp_path / "1_0_2.ixs", dtype=np.int32)
    assert list(ixs) == EXP_IXS
    adj = np.fromfile(tmp_path / "1_0_2.adj", dtype=np.int32)
    assert list(adj) == EXP_ADJ
    corr = np.fromfile(tmp_path / "1_0_2.corr", dtype=np.float32)
    assert np.allclose(corr, EXP_CORR, atol=1e-3)


def test_hetcor_two_stage_merged(tmp_path):
    """hetcor path: SE files supply per-entry effective sample sizes.

    With tiny SEs (huge ESS) the weak marker-trait correlations of the
    fixture become significant, so more markers survive than in the plain
    Pearson run at the same alpha — exercises the ESS threshold machinery
    end-to-end (`cli.cpp:194-346` hetcor branch).
    """
    # build SE files matching the corr fixtures
    mxp_lines = open(p("marker_trait_summary_stats.txt")).read().splitlines()
    with open(tmp_path / "mxp_se.txt", "w") as f:
        f.write(mxp_lines[0] + "\n")
        for line in mxp_lines[1:]:
            fields = line.split()
            f.write(" ".join(fields[:3] + ["0.00001"] * (len(fields) - 3)) + "\n")
    pxp_lines = open(p("trait_summary_stats.txt")).read().splitlines()
    with open(tmp_path / "pxp_se.txt", "w") as f:
        f.write(pxp_lines[0] + "\n")
        for line in pxp_lines[1:]:
            fields = line.split()
            f.write(" ".join(fields[:1] + ["0.00001"] * (len(fields) - 1)) + "\n")

    args = _base_args(
        tmp_path,
        mxp_se=str(tmp_path / "mxp_se.txt"),
        pxp_se=str(tmp_path / "pxp_se.txt"),
    )
    assert args.hetcor
    res = cuskss(args, verbose=False)
    # with ESS ~ 1e10 the weak fixture correlations stay significant and a
    # connected skeleton with markers survives both stages
    assert res.num_markers() >= 3
    assert np.all(np.isfinite(res.S))  # per-entry ESS carried through
    assert res.S.max() > 1e8
    adj = np.fromfile(tmp_path / "cuskss_merged.adj", dtype=np.int32)
    assert adj.sum() > 0


def test_cuskss_time_index_restricts_conditioning(tmp_path):
    """time-indexed traits forbid conditioning on later-time variables."""
    args = _base_args(tmp_path, time_index=p("time_index.txt"))
    assert args.time_indexed
    res = cuskss(args, verbose=False)
    assert res.num_var >= res.num_phen


@pytest.mark.parametrize("panel_mode", ["replicated", "rowsharded"])
def test_cuskss_sharded_byte_identical(tmp_path, panel_mode):
    """The full cuskss workflow on an 8-device mesh (both panel modes)
    writes byte-identical outputs to the single-device run — the multi-chip
    wiring of the summary-stat path (`cli.cpp:194-346` +
    `hetcor-cuPC-S.cu:75-341`, replacing the per-GPU block loop of
    `ci-gwas.py:100-104`)."""
    import hashlib

    import jax
    from jax.sharding import Mesh

    plain_dir = tmp_path / "plain"
    mesh_dir = tmp_path / panel_mode
    plain_dir.mkdir()
    mesh_dir.mkdir()
    # hetcor inputs (SE files) so the heterogeneous-ESS kernels run
    mxp_lines = open(p("marker_trait_summary_stats.txt")).read().splitlines()
    mxp_se = tmp_path / "mxp_se.txt"
    with open(mxp_se, "w") as f:
        f.write(mxp_lines[0] + "\n")
        for line in mxp_lines[1:]:
            fields = line.split()
            f.write(" ".join(fields[:3] + ["0.00001"] * (len(fields) - 3)) + "\n")
    pxp_lines = open(p("trait_summary_stats.txt")).read().splitlines()
    pxp_se = tmp_path / "pxp_se.txt"
    with open(pxp_se, "w") as f:
        f.write(pxp_lines[0] + "\n")
        for line in pxp_lines[1:]:
            fields = line.split()
            f.write(" ".join(fields[:1] + ["0.00001"] * (len(fields) - 1)) + "\n")
    kw = dict(mxp_se=str(mxp_se), pxp_se=str(pxp_se), max_level_two=1)
    cuskss(_base_args(plain_dir, **kw, outdir=str(plain_dir)), verbose=False)
    mesh = Mesh(np.array(jax.devices()), ("marker",))
    cuskss(
        _base_args(mesh_dir, **kw, outdir=str(mesh_dir)),
        verbose=False, mesh=mesh, panel_mode=panel_mode,
    )

    def hashes(d):
        return {
            f.name: hashlib.sha256(f.read_bytes()).hexdigest()
            for f in sorted(d.iterdir()) if f.is_file()
        }

    got, exp = hashes(mesh_dir), hashes(plain_dir)
    assert exp, "no outputs produced"
    assert got == exp


def test_assemble_cuskss_panels_device_matches_host():
    """Device assembly from the compact tril/blocks must reproduce
    `make_square_cuskss_inputs` exactly (incl. the loader's NaN -> 0 on
    mxm, the diagonal from the tril, and the pearson ESS fill)."""
    import jax.numpy as jnp

    from cigwas_tpu.pipelines.cuskss import assemble_cuskss_panels_device

    rng = np.random.default_rng(4)
    m, p, n = 37, 3, 50000.0
    full = rng.normal(size=(m, m)).astype(np.float32)
    full = ((full + full.T) / 2).astype(np.float32)
    full[rng.random((m, m)) < 0.02] = np.nan
    full = np.triu(full) + np.triu(full, 1).T  # symmetric w/ NaN pattern
    tril = full[np.tril_indices(m)]
    mxp = rng.normal(size=(m, p)).astype(np.float32)
    pxp = rng.normal(size=(p, p)).astype(np.float32)
    mp_ess = rng.uniform(1e4, 5e4, (m, p)).astype(np.float32)
    pp_ess = rng.uniform(1e4, 5e4, (p, p)).astype(np.float32)

    C_dev, N_dev = assemble_cuskss_panels_device(
        tril, mxp, pxp, n, mp_ess=mp_ess, pp_ess=pp_ess
    )
    C_k, N_k = np.asarray(C_dev), np.asarray(N_dev)
    v = m + p
    exp_C = np.ones((v, v), np.float32)
    exp_C[:m, :m] = np.nan_to_num(full)
    exp_C[:m, m:] = mxp
    exp_C[m:, :m] = mxp.T
    exp_C[m:, m:] = pxp
    exp_N = np.full((v, v), n, np.float32)
    exp_N[:m, m:] = mp_ess
    exp_N[m:, :m] = mp_ess.T
    exp_N[m:, m:] = pp_ess
    np.testing.assert_array_equal(C_k, exp_C)
    np.testing.assert_array_equal(N_k, exp_N)

    # pearson mode: constant ESS everywhere
    C2, N2 = assemble_cuskss_panels_device(tril, mxp, pxp, n)
    assert (np.asarray(N2) == n).all()
    np.testing.assert_array_equal(np.asarray(C2), exp_C)
