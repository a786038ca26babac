import numpy as np
import pytest

from cigwas_tpu.utils.combinatorics import (
    binom,
    colex_combinations_chunk,
    colex_unrank,
)
from cigwas_tpu.utils.stats import fisher_z, hetcor_threshold, threshold_array


def test_threshold_array_reference_value():
    # pins the reference's `threshold.at_10_e_min_8` test (`cupc_tests.cpp:10-15`)
    th = threshold_array(500000, 1e-8)
    assert th[0] == pytest.approx(0.0081045, abs=1e-4)
    assert th.shape == (15,)
    # thresholds grow with level (denominator shrinks)
    assert np.all(np.diff(th) > 0)


def test_hetcor_threshold_matches_level0():
    # th / sqrt(n - 3) must equal the level-0 array threshold
    n, alpha = 10000, 1e-5
    assert hetcor_threshold(alpha) / np.sqrt(n - 3) == pytest.approx(
        threshold_array(n, alpha)[0], rel=1e-6
    )


def test_fisher_z_is_abs_atanh():
    v = np.array([-0.9, -0.1, 0.0, 0.5])
    assert np.allclose(fisher_z(v), np.abs(np.arctanh(v)))


def test_colex_unrank_enumerates_all_combinations():
    # colex ranks of {0..n-1} choose l cover every combination exactly once,
    # and the rank of any combination is independent of n
    from itertools import combinations

    n, l = 7, 3
    seen = set()
    for r in range(binom(n, l)):
        c = tuple(colex_unrank(r, l))
        assert len(set(c)) == l and all(0 <= e < n for e in c)
        seen.add(c)
    assert seen == set(tuple(sorted(c)) for c in combinations(range(n), l))


def test_colex_chunk_matches_unrank():
    chunk = colex_combinations_chunk(5, 10, 4)
    for i in range(10):
        assert list(chunk[i]) == colex_unrank(5 + i, 4)


def test_vis_corr_plot_scatter():
    """`cigwas_tpu.vis.corr_plot` reads triangular f32 dumps and renders
    the reference's QC scatter (`py-vis/vis.py:23-52`)."""
    import os
    import tempfile

    import matplotlib

    matplotlib.use("Agg")
    import numpy as np

    from cigwas_tpu.vis import corr_plot, read_floats_from_bin

    m = 12
    nv = m * (m - 1) // 2
    rng = np.random.default_rng(3)
    v1 = rng.uniform(-1, 1, nv).astype(np.float32)
    v2 = (v1 * 0.9).astype(np.float32)
    with tempfile.TemporaryDirectory() as td:
        a, b = os.path.join(td, "a.bin"), os.path.join(td, "b.bin")
        v1.tofile(a)
        v2.tofile(b)
        assert np.allclose(read_floats_from_bin(a, nv), v1)
        ax = corr_plot(a, b, m, title="qc")
        # the annotation carries the correlation of the two dumps (=1.0)
        assert any("1.0" in t.get_text() for t in ax.texts)
        out = os.path.join(td, "p.png")
        ax.figure.savefig(out)
        assert os.path.getsize(out) > 0
