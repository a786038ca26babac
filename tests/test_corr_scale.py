"""Scale validation for the streaming banded correlation path (VERDICT r1
item 8): the genome-wide input pipeline must stitch row tiles correctly at
m >> row_tile, matching the reference's rolling-batch banded stream
(`corr_host.cu:1199-1319, 1321-1531`) without ever materializing a dense
(m, m) panel.
"""

import numpy as np
import pytest
from scipy.stats import kendalltau

from cigwas_tpu.io.bed import encode_bed_values
from cigwas_tpu.ops.corr import banded_row_abs_sums, kendall_npn_corr_banded

M = 8192
N = 128
WIDTH = 96
ROW_TILE = 2048


@pytest.fixture(scope="module")
def big_banded():
    """m=8192 markers with AR(1)-style LD so the band is non-trivial."""
    rng = np.random.default_rng(42)
    latent = rng.normal(size=N)
    g = np.empty((M, N), dtype=np.float32)
    for i in range(M):
        latent = 0.9 * latent + np.sqrt(1 - 0.9**2) * rng.normal(size=N)
        pfreq = 1 / (1 + np.exp(-latent))
        g[i] = (rng.random(N) < pfreq).astype(np.float32) + (
            rng.random(N) < pfreq
        )
    g[rng.random((M, N)) < 0.02] = np.nan  # missing genotypes
    bb = encode_bed_values(g)
    band = kendall_npn_corr_banded(bb, N, WIDTH, row_tile=ROW_TILE)
    return g, band


def test_band_shape_and_edge_zeroing(big_banded):
    g, band = big_banded
    assert band.shape == (M, WIDTH)
    # entries whose global column falls off the chromosome are exactly zero
    for i in range(M - WIDTH, M):
        past = np.arange(1, WIDTH + 1) + i >= M
        assert np.all(band[i][past] == 0.0)
    assert banded_row_abs_sums(band).shape == (M,)


def test_band_entries_match_scipy_across_tiles(big_banded):
    """Spot-check band entries against scipy's tau-b, concentrating on the
    row-tile seams (rows t*ROW_TILE - 1 .. t*ROW_TILE + 1) where the column
    panel of one tile must reach ROW_TILE + WIDTH markers into the next."""
    g, band = big_banded
    rng = np.random.default_rng(7)
    rows = list(rng.integers(0, M - WIDTH, size=24))
    for t in (1, 2, 3):
        rows += [t * ROW_TILE - 1, t * ROW_TILE, t * ROW_TILE + 1]
    for i in rows:
        for j in rng.integers(0, WIDTH, size=3):
            col = int(i + 1 + j)
            if col >= M:
                continue
            mask = ~np.isnan(g[i]) & ~np.isnan(g[col])
            tau = kendalltau(g[i][mask], g[col][mask]).statistic
            exp = 0.0 if np.isnan(tau) else np.sin(np.pi / 2 * tau)
            assert band[i, j] == pytest.approx(exp, abs=3e-5), (int(i), int(j))


def test_blocking_runs_on_scale_band(big_banded):
    """LD blocking consumes the m=8192 band end-to-end: blocks cover the
    chromosome, respect the max size, and are contiguous."""
    from cigwas_tpu.blocking import block_chr

    g, band = big_banded
    sums = banded_row_abs_sums(band)
    blocks = block_chr(sums, "1", max_block_size=1500)
    assert len(blocks) > 1
    assert blocks[0].first_marker_ix == 0
    assert blocks[-1].last_marker_ix == M - 1
    for a, b in zip(blocks, blocks[1:]):
        assert b.first_marker_ix == a.last_marker_ix + 1
    # the bisection targets max_block_size within MAX_BLOCK_SIZE_TOL and may
    # stop when the window converges (`blocking.cpp:102-136`); sizes stay of
    # the requested order
    assert max(b.block_size() for b in blocks) <= 3000
