"""sDAVS adjustment-set search tests on analytically-known structures."""

import numpy as np
import pytest

from cigwas_tpu.pag.davs import (
    davs_ace,
    gauss_ci_pvalue,
    is_poss_ancestor,
    lm_cov,
    possible_de,
    search_am,
)


def edge(g, i, j, mark_at_j, mark_at_i):
    g[i, j] = mark_at_j
    g[j, i] = mark_at_i


def test_search_am_parents_and_spouses():
    g = np.zeros((3, 3), dtype=np.int32)
    edge(g, 0, 2, 2, 3)  # 0 -> 2
    edge(g, 1, 2, 2, 2)  # 1 <-> 2
    assert search_am(g, 2, "pa") == [0]
    assert search_am(g, 2, "sp") == [1]


def test_possible_de_directed_chain():
    g = np.zeros((4, 4), dtype=np.int32)
    edge(g, 0, 1, 2, 3)
    edge(g, 1, 2, 2, 3)
    edge(g, 3, 0, 2, 3)  # 3 -> 0; 3 is an ancestor, not a descendant
    assert possible_de(g, 0) == [0, 1, 2]


def test_is_poss_ancestor():
    g = np.zeros((3, 3), dtype=np.int32)
    edge(g, 0, 1, 2, 3)  # 0 -> 1
    edge(g, 1, 2, 2, 3)  # 1 -> 2
    assert is_poss_ancestor(0, 2, g)
    assert not is_poss_ancestor(2, 0, g)


def test_gauss_ci_pvalue_behaviour():
    # strong correlation -> tiny p; conditioning on the mediator -> large p
    rng = np.random.default_rng(0)
    n = 20000
    z = rng.normal(size=n)
    x = z + 0.5 * rng.normal(size=n)
    y = z + 0.5 * rng.normal(size=n)
    C = np.corrcoef(np.stack([x, y, z]))
    assert gauss_ci_pvalue(C, 0, 1, [], n) < 1e-10
    assert gauss_ci_pvalue(C, 0, 1, [2], n) > 0.01


def test_lm_cov_recovers_regression_coefficient():
    rng = np.random.default_rng(1)
    n = 50000
    x = rng.normal(size=n)
    c = rng.normal(size=n)
    y = 0.7 * x + 0.3 * c + rng.normal(size=n)
    data = np.stack([x, c, y])
    # standardize to correlation scale
    data = (data - data.mean(1, keepdims=True)) / data.std(1, keepdims=True)
    C = np.corrcoef(data)
    beta_std = lm_cov(C, 2, [0, 1])
    # in standardized scale: beta = 0.7 * sd(x) / sd(y)
    exp = 0.7 * x.std() / y.std()
    assert beta_std == pytest.approx(exp, abs=0.02)


def test_davs_ace_instrumental_structure():
    """Q -> W -> Y with confounder U of (W, Y): DAVS should estimate the
    causal W->Y effect using Q as the COSO variable."""
    rng = np.random.default_rng(2)
    n = 100000
    q = rng.normal(size=n)
    u = rng.normal(size=n)
    w = 0.8 * q + u + rng.normal(size=n)
    y = 0.5 * w + u + rng.normal(size=n)
    # variables: q=0, u=1, w=2, y=3 (U observed here so an adjustment set
    # exists in the possible-d-sep set)
    data = np.stack([q, u, w, y])
    C = np.corrcoef(data)
    pag = np.zeros((4, 4), dtype=np.int32)
    edge(pag, 0, 2, 2, 3)  # q -> w
    edge(pag, 1, 2, 2, 3)  # u -> w
    edge(pag, 1, 3, 2, 3)  # u -> y
    edge(pag, 2, 3, 2, 3)  # w -> y
    ace = davs_ace(C, 2, 3, 0, pag, n, alpha=0.001)
    # standardized true effect: 0.5 * sd(w)/sd(y)
    exp = 0.5 * w.std() / y.std()
    assert ace == pytest.approx(exp, abs=0.05)


def test_davs_ace_zero_when_not_descendant():
    C = np.eye(3)
    pag = np.zeros((3, 3), dtype=np.int32)
    edge(pag, 1, 0, 2, 3)  # y -> w (w not ancestor of y)
    assert davs_ace(C, 0, 1, 2, pag, 1000) == 0.0
