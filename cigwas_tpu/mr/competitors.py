"""Competitor-method MR evaluation harness (IVW / Egger).

Python equivalent of the reference's simulation benchmark
`simulation/run_mr.R`: per-(SNP, trait) GWAS regressions select instruments
(`run_lm`, `run_mr.R:80-94`; `G_it = GWAS_Ps < alpha`, `run_mr.R:168`),
then every ordered trait pair is analysed with a univariable MR estimator
(`run_pairwise_mr_analyses`, `run_mr.R:39-78`). The estimators replace
`MendelianRandomization::mr_ivw` / `mr_egger`:

* IVW: weighted regression of the outcome associations on the exposure
  associations without intercept, weights 1/se_out^2; random-effects
  standard errors (scaled by max(1, sqrt(Q / (J - 1)))),
* Egger: same with an intercept (the pleiotropy term), exposure
  associations sign-oriented positive, SEs scaled by
  max(1, sqrt(Q / (J - 2))),
* ``robust=True`` (the reference passes robust=T): Tukey-bisquare IRLS on
  the weighted design, as in :mod:`cigwas_tpu.mr.mvivw` — close to but not
  bit-identical to the R packages' lmrob backend.

CAUSE and MR-PRESSO are external R packages with no local equivalent and
are intentionally out of scope (`run_mr.R:96-135, 214-248`); the harness
reports IVW/Egger alongside CI-GWAS's own MVIVW for the same simulated DAG.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from scipy.stats import norm

from cigwas_tpu.mr.mvivw import _bisquare_weights


def gwas_associations(snps: np.ndarray, traits: np.ndarray):
    """Per-(SNP, trait) simple linear regression y ~ x (`run_lm`,
    `run_mr.R:80-94` fits pheno ~ SNP).

    snps: (n, m), traits: (n, p). Returns (beta, se, z, pval), each (m, p).
    """
    snps = np.asarray(snps, dtype=np.float64)
    traits = np.asarray(traits, dtype=np.float64)
    n = snps.shape[0]
    xc = snps - snps.mean(axis=0)
    yc = traits - traits.mean(axis=0)
    sxx = (xc**2).sum(axis=0)  # (m,)
    beta = (xc.T @ yc) / sxx[:, None]  # (m, p)
    # residual variance of y - beta x per pair
    syy = (yc**2).sum(axis=0)  # (p,)
    rss = syy[None, :] - beta**2 * sxx[:, None]
    sigma2 = rss / (n - 2)
    se = np.sqrt(sigma2 / sxx[:, None])
    z = beta / se
    pval = 2 * norm.sf(np.abs(z))
    return beta, se, z, pval


@dataclass
class MrResult:
    exposure: int
    outcome: int
    p: float
    p_het: float
    est: float
    q: float
    num_ivs: int


def _wls_1d(X: np.ndarray, y: np.ndarray, robust: bool):
    """OLS (or bisquare-IRLS) on an already-weighted design; returns
    (coef, cov_unscaled, resid)."""
    if not robust:
        coef, *_ = np.linalg.lstsq(X, y, rcond=None)
    else:
        coef, *_ = np.linalg.lstsq(X, y, rcond=None)
        for _ in range(50):
            resid = y - X @ coef
            scale = 1.4826 * np.median(np.abs(resid - np.median(resid)))
            if scale <= 1e-12:
                break
            rw = _bisquare_weights(resid / scale)
            sw = np.sqrt(np.clip(rw, 1e-8, None))
            new, *_ = np.linalg.lstsq(X * sw[:, None], y * sw, rcond=None)
            if np.allclose(new, coef, rtol=1e-10, atol=1e-12):
                coef = new
                break
            coef = new
    resid = y - X @ coef
    cov = np.linalg.pinv(X.T @ X)
    return coef, cov, resid


def mr_ivw(bx, bxse, by, byse, robust: bool = False) -> MrResult:
    """Univariable IVW (`MendelianRandomization::mr_ivw` semantics,
    random-effects model)."""
    bx, by, byse = (np.asarray(v, dtype=np.float64) for v in (bx, by, byse))
    j = len(bx)
    X = (bx / byse)[:, None]
    y = by / byse
    coef, cov, resid = _wls_1d(X, y, robust)
    q = float((resid**2).sum())
    phi = max(1.0, np.sqrt(q / (j - 1))) if j > 1 else 1.0
    se = float(np.sqrt(cov[0, 0])) * phi
    est = float(coef[0])
    p = float(2 * norm.sf(abs(est / se))) if se > 0 else 1.0
    from scipy.stats import chi2

    p_het = float(chi2.sf(q, j - 1)) if j > 1 else 1.0
    return MrResult(-1, -1, p, p_het, est, q, j)


def mr_egger(bx, bxse, by, byse, robust: bool = False) -> MrResult:
    """Univariable MR-Egger (`MendelianRandomization::mr_egger` semantics):
    exposure associations oriented positive, weighted regression with
    intercept, random-effects SEs."""
    bx, by, byse = (np.asarray(v, dtype=np.float64) for v in (bx, by, byse))
    j = len(bx)
    sign = np.where(bx < 0, -1.0, 1.0)
    bxo = bx * sign
    byo = by * sign
    X = np.stack([np.ones(j), bxo], axis=1) / byse[:, None]
    y = byo / byse
    coef, cov, resid = _wls_1d(X, y, robust)
    q = float((resid**2).sum())
    dof = max(j - 2, 1)
    phi = max(1.0, np.sqrt(q / dof))
    se = float(np.sqrt(cov[1, 1])) * phi
    est = float(coef[1])
    p = float(2 * norm.sf(abs(est / se))) if se > 0 else 1.0
    from scipy.stats import chi2

    p_het = float(chi2.sf(q, dof)) if j > 2 else 1.0
    return MrResult(-1, -1, p, p_het, est, q, j)


def run_pairwise_mr_analyses(
    g_it: np.ndarray,
    effects: np.ndarray,
    ses: np.ndarray,
    method=mr_ivw,
    pleio_size: int = 100,
    min_ivs: int = 3,
    robust: bool = True,
) -> list[MrResult]:
    """All ordered trait pairs (`run_pairwise_mr_analyses`, run_mr.R:39-78).

    g_it: (m, p) boolean instrument-candidate matrix (GWAS p < alpha).
    Instruments of an exposure are its associated SNPs associated with at
    most `pleio_size` traits in total.
    """
    g_it = np.asarray(g_it).astype(bool)
    m, p = g_it.shape
    iv2num = g_it.sum(axis=1)
    out: list[MrResult] = []
    for tr1 in range(p):
        ivs = np.where(g_it[:, tr1] & (iv2num <= pleio_size))[0]
        if len(ivs) < min_ivs:
            continue
        for tr2 in range(p):
            if tr1 == tr2:
                continue
            res = method(
                effects[ivs, tr1], ses[ivs, tr1],
                effects[ivs, tr2], ses[ivs, tr2],
                robust=robust,
            )
            res.exposure, res.outcome = tr1, tr2
            out.append(res)
    return out


def run_mr_benchmark(
    snps: np.ndarray,
    traits: np.ndarray,
    alpha: float = 1e-3,
    pleio_size: int = 100,
    min_ivs: int = 3,
    robust: bool = True,
) -> dict:
    """The run_mr.R flow on raw data: GWAS scan -> instrument selection ->
    pairwise IVW + Egger. Returns {"ivw": [...], "egger": [...],
    "g_it": (m, p) bool, "gwas": (beta, se, z, p)}."""
    beta, se, z, pval = gwas_associations(snps, traits)
    g_it = pval < alpha
    return {
        "ivw": run_pairwise_mr_analyses(
            g_it, beta, se, mr_ivw, pleio_size, min_ivs, robust
        ),
        "egger": run_pairwise_mr_analyses(
            g_it, beta, se, mr_egger, pleio_size, min_ivs, robust
        ),
        "g_it": g_it,
        "gwas": (beta, se, z, pval),
    }
