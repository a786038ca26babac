import os

import numpy as np
import pytest

from cigwas_tpu.io import (
    BedDims,
    BfilesBase,
    BimInfo,
    MarkerBlock,
    MarkerSummaryStats,
    MarkerTraitSummaryStats,
    TraitSummaryStats,
    load_phen,
    read_blocks_from_file,
)
from cigwas_tpu.io.bed import decode_bed_values, encode_bed_values
from cigwas_tpu.prep import prep_bed

DATA = os.path.join(os.path.dirname(__file__), "data", "test_files")


def p(name: str) -> str:
    return os.path.join(DATA, name)


def test_bed_prefix_check():
    assert BfilesBase(p("small")).has_valid_bed_prefix()


def test_bed_prefix_rejects_wrong_magic(tmp_path):
    for stem in ("wrong_magic_num_one", "wrong_magic_num_two", "wrong_magic_num_three"):
        bad = BfilesBase(str(tmp_path / stem))
        os.link(p(stem + ".bed"), bad.bed())
        assert not bad.has_valid_bed_prefix()


def test_bed_roundtrip():
    rng = np.random.default_rng(3)
    g = rng.integers(0, 3, size=(7, 13)).astype(np.float32)
    g[rng.random(g.shape) < 0.2] = np.nan
    bb = encode_bed_values(g)
    vals, valid = decode_bed_values(bb, 13)
    dec = np.where(valid == 1, vals, np.nan)
    assert np.allclose(np.nan_to_num(dec), np.nan_to_num(g))
    assert np.array_equal(np.isnan(dec), np.isnan(g))


def test_prep_bed_golden(tmp_path):
    """Pins the reference's prep_tests golden means/stds/dims
    (`prep_tests.cpp:44-73`)."""
    import shutil

    stem = str(tmp_path / "small")
    for sfx in (".bed", ".bim", ".fam"):
        shutil.copy(p("small" + sfx), stem + sfx)
    prep_bed(stem)
    stds = np.loadtxt(stem + ".stds")
    means = np.loadtxt(stem + ".means")
    assert np.allclose(
        stds, [0.66332496, 0.83066239, 0.6, 0.77459667, 0.83066239], atol=1e-6
    )
    assert np.allclose(means, [0.6, 1.1, 0.8, 1.0, 0.9], atol=1e-6)
    dims = BedDims.from_file(stem + ".dim")
    assert dims == BedDims(10, 5)
    assert os.path.exists(stem + ".modes")


def test_read_floats_from_lines_golden():
    """small.phen is a plain float-lines fixture (`io_tests.cpp:126-152`)."""
    from cigwas_tpu.io import read_floats_from_lines

    vals = read_floats_from_lines(p("small.phen"))
    assert vals[0] == pytest.approx(0.72031609)
    assert vals.size == 10


def test_phen_loader_nan():
    """with_nan.phen: header + 2 ID columns + 4 traits, 'nan' -> NaN
    (`corr_tests.cpp:187-190`)."""
    ph = load_phen(p("with_nan.phen"))
    assert ph.num_phen == 4
    assert ph.data.shape == (4, ph.num_samples)
    assert np.isnan(ph.data).any()


def test_blocks_file_global_offsets(tmp_path):
    path = tmp_path / "b.blocks"
    path.write_text("1\t0\t4\n1\t5\t9\n2\t0\t2\n")
    blocks = read_blocks_from_file(str(path))
    assert blocks[0] == MarkerBlock("1", 0, 4)
    assert blocks[0].get_first_marker_global_ix() == 0
    assert blocks[1].get_first_marker_global_ix() == 5
    # chr 2 offset = total markers in chr-1 blocks (10)
    assert blocks[2].get_first_marker_global_ix() == 10
    assert blocks[2].block_size() == 3


def test_trait_summary_stats_golden():
    """Values pinned by `io_tests.cpp` / `cuskss_tests.cpp` expectations."""
    pxp = TraitSummaryStats(p("trait_summary_stats.txt"), sample_size=500000.0)
    assert pxp.get_num_phen() == 3
    c = pxp.get_corrs()
    assert c[0, 1] == pytest.approx(0.0608594558771734, rel=1e-6)
    assert c[1, 0] == pytest.approx(0.0608594558771734, rel=1e-6)  # symmetrized
    assert c[0, 2] == pytest.approx(0.074239793758568, rel=1e-6)
    assert np.all(np.diag(c) == 1.0)
    assert np.all(pxp.get_sample_sizes() == 500000.0)


def test_marker_trait_summary_stats_by_block():
    blocks = read_blocks_from_file(p("blocks.txt"))
    mxp = MarkerTraitSummaryStats(p("marker_trait_summary_stats.txt"), block=blocks[0])
    assert mxp.get_num_phen() == 3
    assert mxp.get_num_markers() == 3
    assert mxp.get_corrs()[2, 0] == pytest.approx(0.0005)


def test_marker_trait_summary_stats_by_indices():
    ixs = np.fromfile(p("marker_indices.bin"), dtype=np.int32)
    mxp = MarkerTraitSummaryStats(p("marker_trait_summary_stats.txt"), marker_ixs=ixs)
    assert mxp.get_num_markers() == len(ixs)


def test_marker_summary_stats_tril():
    mxm = MarkerSummaryStats(p("small_mxm.bin"))
    m = mxm.get_num_markers()
    tril = np.fromfile(p("small_mxm.bin"), dtype=np.float32)
    assert m * (m + 1) // 2 == tril.size
    c = mxm.get_corrs()
    assert np.allclose(c, c.T)


def test_bim_info():
    bim = BimInfo(p("small.bim"))
    assert bim.number_of_lines == 5
    total = sum(bim.num_markers_on_chr)
    assert total == 5
