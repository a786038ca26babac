import numpy as np
import pytest
from scipy.stats import kendalltau

from cigwas_tpu.io.bed import encode_bed_values
from cigwas_tpu.ops.corr import (
    banded_row_abs_sums,
    kendall_npn_corr,
    kendall_npn_corr_banded,
    marker_phen_corr,
    pack_square_corr,
    phen_phen_corr,
)


@pytest.fixture(scope="module")
def geno():
    rng = np.random.default_rng(0)
    m, n = 14, 53
    g = rng.integers(0, 3, size=(m, n)).astype(np.float32)
    g[rng.random((m, n)) < 0.1] = np.nan
    return g, encode_bed_values(g), n


def test_kendall_npn_matches_scipy(geno):
    g, bb, n = geno
    m = g.shape[0]
    C = kendall_npn_corr(bb, n)
    assert C.shape == (m, m)
    assert np.allclose(C, C.T, atol=1e-6)
    assert np.all(np.diag(C) == 1.0)
    for i in range(m):
        for j in range(i + 1, m):
            mask = ~np.isnan(g[i]) & ~np.isnan(g[j])
            tau = kendalltau(g[i][mask], g[j][mask]).statistic
            exp = np.sin(np.pi / 2 * tau)
            assert C[i, j] == pytest.approx(exp, abs=2e-5), (i, j)


def test_kendall_npn_row_tiled_equals_full(geno):
    g, bb, n = geno
    assert np.allclose(
        kendall_npn_corr(bb, n), kendall_npn_corr(bb, n, row_tile=5), atol=1e-6
    )


def test_banded_matches_full(geno):
    g, bb, n = geno
    m = g.shape[0]
    C = kendall_npn_corr(bb, n)
    w = 4
    band = kendall_npn_corr_banded(bb, n, w, row_tile=6)
    for i in range(m):
        for j in range(w):
            col = i + 1 + j
            exp = C[i, col] if col < m else 0.0
            assert band[i, j] == pytest.approx(exp, abs=2e-5)
    sums = banded_row_abs_sums(band)
    assert sums.shape == (m,)
    assert np.allclose(sums, np.abs(band).sum(axis=1))


def test_marker_phen_corr(geno):
    g, bb, n = geno
    m = g.shape[0]
    means = np.array([np.nanmean(g[i]) for i in range(m)], dtype=np.float32)
    stds = np.array([np.nanstd(g[i]) for i in range(m)], dtype=np.float32)
    rng = np.random.default_rng(1)
    phen = rng.normal(size=(3, n)).astype(np.float32)
    phen[0, :4] = np.nan
    mp = marker_phen_corr(bb, phen, means, stds, n)
    for i in range(m):
        for k in range(3):
            msk = ~np.isnan(g[i]) & ~np.isnan(phen[k])
            exp = (
                (g[i][msk] * phen[k][msk]).sum() - means[i] * phen[k][msk].sum()
            ) / (msk.sum() * stds[i])
            assert mp[i, k] == pytest.approx(exp, abs=3e-5)


def test_phen_phen_corr():
    rng = np.random.default_rng(2)
    phen = rng.normal(size=(4, 101)).astype(np.float32)
    phen[1, 7:20] = np.nan
    pp = phen_phen_corr(phen)
    for a in range(4):
        for b in range(4):
            msk = ~np.isnan(phen[a]) & ~np.isnan(phen[b])
            exp = (phen[a][msk] * phen[b][msk]).sum() / msk.sum()
            assert pp[a, b] == pytest.approx(exp, abs=1e-5)


def test_pack_square_corr():
    m, p = 3, 2
    mm = np.arange(9, dtype=np.float32).reshape(3, 3)
    mp_ = np.full((m, p), 0.5, dtype=np.float32)
    pp = np.full((p, p), 0.25, dtype=np.float32)
    sq = pack_square_corr(mm, mp_, pp)
    assert sq.shape == (5, 5)
    assert np.all(np.diag(sq) == 1.0)
    assert sq[0, 3] == 0.5 and sq[3, 0] == 0.5
    assert sq[3, 4] == 0.25
    assert np.allclose(sq[:m, :m][np.triu_indices(m, 1)], mm[np.triu_indices(m, 1)])


def test_phen_phen_corr_with_nan_golden():
    """Pins `cu_phen_corr_pearson_npn.expected_results`
    (`corr_tests.cpp:186-210`) on the with_nan.phen fixture."""
    import os

    from cigwas_tpu.io import load_phen

    path = os.path.join(os.path.dirname(__file__), "data", "test_files", "with_nan.phen")
    ph = load_phen(path)
    pp = phen_phen_corr(ph.data)
    exp = [
        0.24836234542914287,
        0.03862939307838749,
        -0.062494103838,
        0.3617577116109875,
        -0.36021846990149997,
        -0.2546223144976223,
    ]
    obs = pp[np.triu_indices(ph.num_phen, k=1)]
    assert np.allclose(obs, exp, atol=1e-5)


def test_corr_panel_device_matches_separate_paths(geno):
    from cigwas_tpu.ops.corr import corr_panel_device

    g, bb, n = geno
    rng = np.random.default_rng(7)
    p = 3
    phen = rng.normal(size=(p, n)).astype(np.float32)
    phen[0, 5] = np.nan  # NaN phenotype masking must match
    means = np.nanmean(g, axis=1)
    stds = np.nanstd(g, axis=1)
    C_mm = kendall_npn_corr(bb, n)
    C_mp = marker_phen_corr(bb, phen, means, stds, n)
    C_pp = phen_phen_corr(phen)
    expected = pack_square_corr(C_mm, C_mp, C_pp)
    fused_dev, v = corr_panel_device(bb, phen, means, stds, n)
    assert v == expected.shape[0]
    fused_full = np.asarray(fused_dev)
    assert fused_full.shape[0] % 128 == 0  # shape-bucketed
    fused = fused_full[:v, :v]
    assert np.allclose(fused, expected, atol=2e-5, equal_nan=True)
    # padded variables must be inert: zero corr off-diagonal
    pad_block = fused_full[v:, :]
    assert np.all((pad_block == 0.0) | np.isclose(np.abs(pad_block), 1.0))
    assert np.all(fused_full[:v, v:] == 0.0)


def test_corr_panel_device_tiled_matches_host_path():
    """The stripe-built device panel equals the host kendall+pack path on
    the logical variables, across tile-remainder shapes."""
    from cigwas_tpu.io.bed import encode_bed_values
    from cigwas_tpu.ops.corr import (
        corr_panel_device_tiled,
        kendall_npn_corr,
        marker_phen_corr,
        pack_square_corr,
        phen_phen_corr,
    )

    rng = np.random.default_rng(8)
    n, m, p = 700, 150, 3
    maf = rng.uniform(0.1, 0.5, m)
    G = (rng.random((m, n)) < maf[:, None]).astype(np.float32) + (
        rng.random((m, n)) < maf[:, None]
    )
    G[7] = 0.0  # monomorphic -> NaN corr preserved
    Y = rng.normal(size=(p, n)).astype(np.float32)
    Y = (Y - Y.mean(1, keepdims=True)) / Y.std(1, keepdims=True)
    bb = encode_bed_values(G)
    means, stds = G.mean(axis=1), G.std(axis=1)

    C_dev, v = corr_panel_device_tiled(
        bb, Y, means, stds, n, row_tile=64
    )
    assert v == m + p
    assert C_dev.shape[0] % 64 == 0 and C_dev.shape[0] >= v
    got = np.asarray(C_dev)

    mm = kendall_npn_corr(bb, n)
    mp = np.asarray(marker_phen_corr(bb, Y, means, stds, n))
    pp = phen_phen_corr(Y)
    exp = pack_square_corr(mm, mp, pp)
    np.testing.assert_allclose(got[:v, :v], exp, rtol=0, atol=2e-6)
    # NaN pattern preserved for the monomorphic marker
    assert np.isnan(exp[7, 8]) == np.isnan(got[7, 8])
    # pads inert: zero off-diagonal, unit diagonal
    vp = got.shape[0]
    assert np.all(got[v:, :v] == 0) and np.all(got[:v, v:] == 0)
    assert np.all(np.diag(got)[v:] == 1.0)


def test_corr_panel_device_tiled_matches_fused_panel():
    """Tiled builder == the fused single-dispatch builder where both apply."""
    from cigwas_tpu.io.bed import encode_bed_values
    from cigwas_tpu.ops.corr import corr_panel_device, corr_panel_device_tiled

    rng = np.random.default_rng(9)
    n, m, p = 512, 120, 8
    maf = rng.uniform(0.1, 0.5, m)
    G = (rng.random((m, n)) < maf[:, None]).astype(np.float32) + (
        rng.random((m, n)) < maf[:, None]
    )
    Y = rng.normal(size=(p, n)).astype(np.float32)
    bb = encode_bed_values(G)
    means, stds = G.mean(axis=1), G.std(axis=1)
    C_f, v_f = corr_panel_device(bb, Y, means, stds, n)
    C_t, v_t = corr_panel_device_tiled(bb, Y, means, stds, n, row_tile=128)
    assert v_f == v_t
    np.testing.assert_allclose(
        np.asarray(C_f)[:v_f, :v_f], np.asarray(C_t)[:v_t, :v_t],
        rtol=0, atol=2e-6,
    )


def test_banded_row_abs_sums_streaming_matches_two_step():
    """The on-device band reduction must match the two-step
    band-then-host-sum path up to float summation order (it feeds the
    same Hanning smoother; `corr_host.cu:112-128`)."""
    from cigwas_tpu.io.bed import encode_bed_values
    from cigwas_tpu.ops.corr import (
        banded_row_abs_sums,
        banded_row_abs_sums_streaming,
        kendall_npn_corr_banded,
    )

    rng = np.random.default_rng(3)
    m, n, w = 300, 512, 40
    maf = rng.uniform(0.1, 0.5, m)
    dose = (rng.random((m, n)) < maf[:, None]).astype(np.float32) + (
        rng.random((m, n)) < maf[:, None]
    )
    bb = encode_bed_values(dose)
    band = kendall_npn_corr_banded(bb, n, w, row_tile=128)
    two_step = banded_row_abs_sums(band)
    streaming = banded_row_abs_sums_streaming(bb, n, w, row_tile=128)
    np.testing.assert_allclose(streaming, two_step, rtol=2e-5, atol=1e-4)
