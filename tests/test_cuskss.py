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
