"""Correlation-engine parity against the reference's golden fixtures.

Pins the hand-computed expected values of `corr_tests.cpp` /
`bed_marker_test_set.h` (bmt2: 7 markers x 100 individuals, 5 traits).
"""

import os

import numpy as np
import pytest

from cigwas_tpu.ops.corr import (
    kendall_npn_corr,
    kendall_npn_corr_banded,
    marker_corr_mat_antidiag_sums,
    marker_pearson_corr,
    marker_phen_corr,
)


@pytest.fixture(scope="module")
def bmt2():
    path = os.path.join(os.path.dirname(__file__), "data", "bed_marker.npz")
    if not os.path.exists(path):
        pytest.skip("bed_marker fixture cache missing")
    return np.load(path)


def _unpack_tri(vals, m):
    """Upper-tri packed (row-major, no diag) -> dense symmetric with 1 diag."""
    out = np.eye(m, dtype=np.float32)
    iu = np.triu_indices(m, k=1)
    out[iu] = vals
    out[(iu[1], iu[0])] = vals
    return out


def test_kendall_npn_golden(bmt2):
    """`cu_marker_corr_pearson_npn` expected values (`corr_tests.cpp:176-184`)."""
    bb = bmt2["bmt2_marker_vals"].reshape(7, 25)
    C = kendall_npn_corr(bb, 100)
    exp = _unpack_tri(bmt2["bmt2_marker_corrs"], 7)
    assert np.allclose(C, exp, atol=1e-5)


def test_pearson_golden(bmt2):
    """`bed_marker_corr_pearson` expected values (`corr_tests.cpp:155-164`)."""
    bb = bmt2["bmt2_marker_vals"].reshape(7, 25)
    C = marker_pearson_corr(bb, bmt2["bmt2_marker_mean"], bmt2["bmt2_marker_std"], 100)
    exp = _unpack_tri(bmt2["bmt2_marker_corrs_pearson"], 7)
    assert np.allclose(C, exp, atol=1e-5)


def test_antidiag_sums_golden(bmt2):
    """`marker_corr_mat_antidiag_sums` expected values (`corr_tests.cpp:23-32`)."""
    C = _unpack_tri(bmt2["bmt2_marker_corrs"], 7)
    sums = marker_corr_mat_antidiag_sums(C)
    assert np.allclose(sums, bmt2["bmt2_marker_corr_antidiag_sums"], atol=1e-5)


def test_banded_sparse_golden(bmt2):
    """`cu_corr_pearson_npn_batched_sparse` band portion
    (`corr_tests.cpp:35-60`, corr_width=3; rows are [band | marker-phen])."""
    bb = bmt2["bmt2_marker_vals"].reshape(7, 25)
    w, p, m = 3, 5, 7
    # layout: (m + p) rows of [band w | phen p] (`sparse_corr_matrix_size`)
    sparse = bmt2["bmt2_sparse_corrs"].reshape(m + p, w + p)
    band = kendall_npn_corr_banded(bb, 100, w)
    assert np.allclose(band, sparse[:m, :w], atol=1e-5)
    phen = bmt2["bmt2_phen_vals"].reshape(p, 100)
    mp = marker_phen_corr(bb, phen, bmt2["bmt2_marker_mean"], bmt2["bmt2_marker_std"], 100)
    assert np.allclose(mp, sparse[:m, w:], atol=1e-5)


def test_marker_phen_golden_small(bmt2):
    """bmt fixture: 3 markers x 10 individuals x 2 traits."""
    bb = bmt2["bmt_marker_vals"].reshape(3, 3)
    phen = bmt2["bmt_phen_vals"].reshape(2, 10)
    mp = marker_phen_corr(bb, phen, bmt2["bmt_marker_mean"], bmt2["bmt_marker_std"], 10)
    assert mp.shape == (3, 2)
    assert np.all(np.abs(mp) <= 1.0 + 1e-6)
