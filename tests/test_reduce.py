import os

import numpy as np
import pytest

from cigwas_tpu.constants import ML
from cigwas_tpu.skeleton import reduce_gc, reduce_gcs, subset_variables


@pytest.fixture(scope="module")
def parent_set_fixture():
    path = os.path.join(os.path.dirname(__file__), "data", "parent_set.npz")
    if not os.path.exists(path):
        pytest.skip("parent_set fixture cache missing")
    return np.load(path)


@pytest.mark.parametrize("depth", [0, 1, 2])
def test_subset_variables_golden(parent_set_fixture, depth):
    """Pins the reference's parents_tests BFS expectations
    (`parents_tests.cpp:5-39`)."""
    d = parent_set_fixture
    num_markers = int(d["num_markers"])
    num_var = num_markers + int(d["num_phen"])
    obs = subset_variables(d["adj"], num_var, num_markers, depth)
    assert list(obs) == list(d[f"d{depth}"])


def test_reduce_gcs_remaps_sepsets():
    # 4 markers + 1 trait; keep = {0, 2, 4}
    n, p = 5, 1
    G = np.zeros((n, n), np.int32)
    C = np.arange(n * n, dtype=np.float32).reshape(n, n)
    S = np.full((n, n, ML), -1, np.int32)
    S[0, 2, 0] = 4  # kept -> remapped to new index 2
    S[0, 2, 1] = 1  # dropped (not kept)
    S[2, 4, 0] = 0  # kept -> new index 0
    keep = np.array([0, 2, 4])
    red = reduce_gcs(G, C, S, keep, n, p, max_level=3)
    assert red.num_var == 3
    assert list(red.new_to_old_indices) == [0, 2, 4]
    assert red.C[0, 1] == C[0, 2]
    # sepset entries compacted to the front and remapped
    assert list(red.S[0, 1]) == [2, -1, -1]
    assert list(red.S[1, 2]) == [0, -1, -1]


def test_reduce_gcs_respects_ml_stride():
    """Input sepsets are read with stride ML even when max_level < ML
    (`parent_set.cpp:108` hardcodes 14)."""
    n, p = 3, 1
    G = np.zeros((n, n), np.int32)
    C = np.eye(n, dtype=np.float32)
    S = np.full((n, n, ML), -1, np.int32)
    S[0, 1, 0] = 2
    S[0, 1, 5] = 2  # beyond max_level -> ignored
    red = reduce_gcs(G, C, S, np.array([0, 1, 2]), n, p, max_level=2)
    assert red.S.shape == (3, 3, 2)
    assert list(red.S[0, 1]) == [2, -1]


def test_reduce_gcs_pads_narrow_sepset_to_requested_stride():
    """A sepset allocated NARROWER than the requested output stride pads
    with -1 instead of raising: the skeleton allocates only its own run's
    depth (min(ML, max_level)), while the stage-2 reduce requests the full
    ML stride for reference-compatible output (`parent_set.cpp:108`).
    Regression for ADVICE r4 (broadcast ValueError for max_level_two < 14).
    """
    n, p = 3, 1
    G = np.zeros((n, n), np.int32)
    C = np.eye(n, dtype=np.float32)
    S = np.full((n, n, 3), -1, np.int32)
    S[0, 1, 0] = 2
    red = reduce_gcs(G, C, S, np.array([0, 1, 2]), n, p, max_level=ML)
    assert red.S.shape == (3, 3, ML)
    assert list(red.S[0, 1]) == [2] + [-1] * (ML - 1)
    assert (red.S[1, 0] == -1).all()


def test_reduce_gc_subsets_ess():
    n, p = 4, 2
    G = np.ones((n, n), np.int32)
    C = np.random.default_rng(0).normal(size=(n, n)).astype(np.float32)
    N = np.arange(n * n, dtype=np.float32).reshape(n, n)
    keep = np.array([1, 2, 3])
    red = reduce_gc(G, C, N, keep, n, p, max_level=3)
    assert red.num_var == 3
    assert np.allclose(red.S, N[np.ix_(keep, keep)])
    assert np.allclose(red.C, C[np.ix_(keep, keep)])


def test_reduce_gc_index_map_chains():
    """Second-stage reductions must map through the previous stage's
    new_to_old indices (`VariableSubsetIndices`, `parent_set.h:155-163`)."""
    n, p = 4, 1
    G = np.ones((n, n), np.int32)
    C = np.eye(n, dtype=np.float32)
    N = np.ones((n, n), np.float32)
    index_map = np.array([10, 20, 30, 40], dtype=np.int32)
    red = reduce_gc(G, C, N, np.array([1, 3]), n, p, 3, index_map=index_map)
    assert list(red.new_to_old_indices) == [20, 40]


def test_subset_variables_keeps_all_traits():
    # 2 markers, 2 traits, no edges at all: only traits survive at any depth
    n_m, n_p = 2, 2
    G = np.zeros((4, 4), np.int32)
    for depth in (0, 1, 3):
        assert list(subset_variables(G, 4, n_m, depth)) == [2, 3]
