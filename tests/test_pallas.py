"""Pallas kernel correctness (interpret mode on CPU)."""

import numpy as np
import pytest

from cigwas_tpu.ops.pallas.level1 import level1_min_rho


def _reference_sweep(C: np.ndarray) -> np.ndarray:
    v = C.shape[0]
    cxs = C[:, None, :]
    cys = C[None, :, :]
    with np.errstate(invalid="ignore", divide="ignore"):
        rho = np.abs(C[:, :, None] - cxs * cys) / np.sqrt(
            np.abs((1 - cxs**2) * (1 - cys**2))
        )
    s = np.arange(v)
    mask = (s[None, None, :] == s[:, None, None]) | (
        s[None, None, :] == s[None, :, None]
    )
    rho = np.where(mask | np.isnan(rho), 2.0, rho)
    return rho.min(axis=2)


def test_level1_min_rho_matches_reference():
    rng = np.random.default_rng(0)
    C = np.corrcoef(rng.normal(size=(40, 300))).astype(np.float32)
    out = np.asarray(level1_min_rho(C, interpret=True))
    exp = _reference_sweep(C)
    assert np.allclose(out, exp, atol=2e-6)


def test_level1_min_rho_handles_perfect_correlation():
    # duplicated variable -> |1 - c^2| = 0 for some conditioning sets; the
    # NaN guard must keep those tests inert
    rng = np.random.default_rng(1)
    base = rng.normal(size=(5, 200))
    data = np.vstack([base, base[0:1]])  # variable 5 == variable 0
    C = np.corrcoef(data).astype(np.float32)
    out = np.asarray(level1_min_rho(C, interpret=True))
    exp = _reference_sweep(C)
    assert np.allclose(out, exp, atol=2e-6)


def test_level1_min_rho_padding_masked():
    # v not a multiple of the tile size: padded variables must not win the min
    rng = np.random.default_rng(2)
    C = np.corrcoef(rng.normal(size=(13, 100))).astype(np.float32)
    out = np.asarray(level1_min_rho(C, interpret=True))
    exp = _reference_sweep(C)
    assert out.shape == (13, 13)
    assert np.allclose(out, exp, atol=2e-6)
