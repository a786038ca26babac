import os

import numpy as np
import pytest

from cigwas_tpu.blocking import block_chr, hanning_smoothing
from cigwas_tpu.io.blocks import MarkerBlock


@pytest.fixture(scope="module")
def blocking_fixture():
    path = os.path.join(os.path.dirname(__file__), "data", "blocking.npz")
    if not os.path.exists(path):
        pytest.skip("blocking fixture cache missing")
    return np.load(path)


def test_block_chr_golden_boundaries(blocking_fixture):
    """Pins the reference's `block_chr.expected_results_synthetic_data`
    (`blocking_tests.cpp:9-38`): exact 17-block partition at max size 500."""
    v = blocking_fixture["v"]
    obs = block_chr(v, "1", 500)
    exp = [
        MarkerBlock("1", 0, 194),
        MarkerBlock("1", 195, 335),
        MarkerBlock("1", 336, 620),
        MarkerBlock("1", 621, 843),
        MarkerBlock("1", 844, 1227),
        MarkerBlock("1", 1228, 1447),
        MarkerBlock("1", 1448, 1910),
        MarkerBlock("1", 1911, 2112),
        MarkerBlock("1", 2113, 2504),
        MarkerBlock("1", 2505, 2735),
        MarkerBlock("1", 2736, 2930),
        MarkerBlock("1", 2931, 3085),
        MarkerBlock("1", 3086, 3172),
        MarkerBlock("1", 3173, 3352),
        MarkerBlock("1", 3353, 3574),
        MarkerBlock("1", 3575, 3897),
        MarkerBlock("1", 3898, 3997),
    ]
    assert len(obs) == len(exp)
    for o, e in zip(obs, exp):
        assert o == e


def test_hanning_smoothing_golden(blocking_fixture):
    """Pins `hanning_smoothing.expected_results` (`blocking_tests.cpp:40-52`)."""
    v = blocking_fixture["v"][:1000]
    exp = blocking_fixture["smooth"]
    obs = hanning_smoothing(v, 101)
    assert obs.shape == exp.shape
    assert np.allclose(obs, exp, atol=0.01)


def test_blocks_cover_everything(blocking_fixture):
    v = blocking_fixture["v"]
    blocks = block_chr(v, "1", 500)
    assert blocks[0].first_marker_ix == 0
    assert blocks[-1].last_marker_ix == len(v) - 1
    for a, b in zip(blocks, blocks[1:]):
        assert b.first_marker_ix == a.last_marker_ix + 1
    assert max(b.block_size() for b in blocks) <= 500
