"""Competitor MR harness (IVW / Egger): recovery on simulated DAGs and
estimator sanity against hand-computed fixed-effects results."""

import numpy as np
import pytest

from cigwas_tpu.mr import (
    gwas_associations,
    mr_egger,
    mr_ivw,
    mr_presso,
    run_mr_benchmark,
    run_presso_analyses,
)


def _simulate(seed=0, n=6000, m=60, beta_t=0.4):
    """3 traits: T0 -> T1 (effect beta_t), T2 independent; 10 IVs per trait.

    IV strengths are SPREAD (0.15..0.6): Egger's slope is identified by the
    variation of the instrument strengths, so equal-strength instruments
    would leave it unpowered by construction."""
    rng = np.random.default_rng(seed)
    maf = rng.uniform(0.2, 0.5, m)
    G = (rng.random((n, m)) < maf).astype(np.float64) + (
        rng.random((n, m)) < maf
    )
    Gs = (G - G.mean(0)) / G.std(0)
    w = np.linspace(0.15, 0.6, 10)
    t0 = Gs[:, :10] @ w + rng.normal(size=n)
    t1 = Gs[:, 10:20] @ w + beta_t * t0 + rng.normal(size=n)
    t2 = Gs[:, 20:30] @ w + rng.normal(size=n)
    return G, np.stack([t0, t1, t2], axis=1)


def test_gwas_associations_match_statsmodels_style_ols():
    rng = np.random.default_rng(1)
    n = 500
    x = rng.normal(size=n)
    y = 0.7 * x + rng.normal(size=n)
    beta, se, z, p = gwas_associations(x[:, None], y[:, None])
    # closed-form simple regression
    xc = x - x.mean()
    yc = y - y.mean()
    b = (xc @ yc) / (xc @ xc)
    resid = yc - b * xc
    s = np.sqrt((resid @ resid) / (n - 2) / (xc @ xc))
    assert np.isclose(beta[0, 0], b)
    assert np.isclose(se[0, 0], s)


def test_ivw_fixed_effects_closed_form():
    rng = np.random.default_rng(2)
    j = 12
    bx = rng.uniform(0.2, 0.5, j)
    byse = rng.uniform(0.01, 0.03, j)
    by = 0.5 * bx  # exact effect, Q ~ 0 -> phi = 1
    res = mr_ivw(bx, None, by, byse, robust=False)
    w = 1 / byse**2
    expect = (w * bx * by).sum() / (w * bx * bx).sum()
    assert np.isclose(res.est, expect)
    assert res.p < 1e-10


def test_egger_recovers_slope_under_directional_pleiotropy():
    rng = np.random.default_rng(3)
    j = 40
    bx = rng.uniform(0.2, 0.6, j)
    byse = np.full(j, 0.02)
    pleio = 0.05  # constant directional pleiotropy -> IVW biased, Egger not
    by = 0.3 * bx + pleio + rng.normal(size=j) * byse
    egger = mr_egger(bx, None, by, byse, robust=False)
    ivw = mr_ivw(bx, None, by, byse, robust=False)
    assert abs(egger.est - 0.3) < 0.05
    assert ivw.est - 0.3 > 0.05  # upward biased by the intercept term


@pytest.mark.parametrize("robust", [False, True])
def test_benchmark_recovers_planted_edge(robust):
    G, T = _simulate()
    out = run_mr_benchmark(G, T, alpha=1e-3, robust=robust)
    for key, p_bound in (("ivw", 1e-4), ("egger", 0.05)):
        res = {(r.exposure, r.outcome): r for r in out[key]}
        fwd = res[(0, 1)]
        assert fwd.p < p_bound, (key, fwd)
        assert abs(fwd.est - 0.4) < 0.15, (key, fwd.est)
        # no false positives from the null trait as exposure
        for pair in ((2, 0), (2, 1)):
            if pair in res:
                assert res[pair].p > 1e-3, (key, pair, res[pair])


def _presso_summary_stats(seed=5, j=30, beta=0.3, outliers=(), pleio=0.5):
    """Summary-stat pair with optional planted horizontal-pleiotropy
    outliers (direct instrument->outcome effects bypassing the exposure)."""
    rng = np.random.default_rng(seed)
    bx = rng.uniform(0.2, 0.6, j)
    bxse = np.full(j, 0.02)
    byse = np.full(j, 0.02)
    by = beta * bx + rng.normal(size=j) * byse
    for i in outliers:
        by[i] += pleio
    return bx, bxse, by, byse


def test_presso_null_is_calibrated_and_matches_ivw():
    bx, bxse, by, byse = _presso_summary_stats()
    res = mr_presso(bx, bxse, by, byse, n_dist=600, seed=7)
    # no pleiotropy: the global RSS test must not fire, no outliers, and
    # the raw row is a weighted no-intercept regression = fixed-effect IVW
    assert res.global_p >= 0.1, res.global_p
    assert res.outliers == ()
    w = 1 / byse**2
    expect = (w * bx * by).sum() / (w * bx * bx).sum()
    assert np.isclose(res.raw_est, expect)
    assert np.isnan(res.corrected_p)  # run_mr.R falls back to the raw row
    assert np.isclose(res.est, res.raw_est)
    assert abs(res.raw_est - 0.3) < 0.05


def test_presso_detects_and_corrects_planted_outliers():
    planted = (3, 17)
    bx, bxse, by, byse = _presso_summary_stats(outliers=planted)
    res = mr_presso(bx, bxse, by, byse, n_dist=600, seed=11)
    assert res.global_p < 0.1  # global heterogeneity detected
    # the planted SNPs are flagged and almost nothing else: moderate
    # pleiotropy displaces the slope too little for non-outlier residuals
    # to clear the Bonferroni threshold (very large outliers legitimately
    # drag bystanders over it — the RSS design shared with the R package)
    assert set(planted).issubset(res.outliers), res.outliers
    assert len(res.outliers) <= 4, res.outliers
    # correction removes the upward bias the outliers induce
    assert res.raw_est - 0.3 > 0.05
    assert abs(res.corrected_est - 0.3) < 0.05
    assert res.est == res.corrected_est
    # distortion: raw is materially displaced from corrected, and the
    # displacement is larger than typical random-SNP-removal displacement
    assert res.distortion_coef > 0
    assert res.distortion_p < 0.1


def test_presso_too_few_instruments_keeps_raw_row_only():
    bx, bxse, by, byse = _presso_summary_stats(j=3)
    res = mr_presso(bx, bxse, by, byse, n_dist=100)
    assert np.isfinite(res.raw_est) and np.isnan(res.global_p)


def test_presso_pair_loop_uses_unfiltered_instruments():
    G, T = _simulate()
    beta, se, z, pval = gwas_associations(G, T)
    g_it = pval < 1e-3
    out = run_presso_analyses(g_it, beta, se, n_dist=300)
    res = {(r.exposure, r.outcome): r for r in out}
    # instruments per exposure = ALL associated SNPs (run_mr.R:220)
    assert res[(0, 1)].num_ivs == int(g_it[:, 0].sum())
    assert res[(0, 1)].p < 1e-3
    assert abs(res[(0, 1)].est - 0.4) < 0.15


def test_instrument_selection_pleiotropy_filter():
    G, T = _simulate()
    out = run_mr_benchmark(G, T, alpha=1e-3, pleio_size=100)
    g_it = out["g_it"]
    # T1's parents include T0's parents via the causal chain; pleio_size=1
    # must drop shared instruments
    from cigwas_tpu.mr import run_pairwise_mr_analyses, mr_ivw as _ivw

    beta, se, *_ = out["gwas"]
    strict = run_pairwise_mr_analyses(g_it, beta, se, _ivw, pleio_size=1)
    loose = run_pairwise_mr_analyses(g_it, beta, se, _ivw, pleio_size=100)

    def nivs(res, pair):
        d = {(r.exposure, r.outcome): r.num_ivs for r in res}
        return d.get(pair)

    assert (nivs(strict, (0, 1)) or 0) <= (nivs(loose, (0, 1)) or 0)


class TestCause:
    """CAUSE port (`run_cause_on_tr`, run_mr.R:97-135): method contracts
    on simulated data — the R package's grid/loo internals cannot be
    golden-pinned without R, so tests pin the decisions the benchmark
    consumes (gamma median, sharing-vs-causal p)."""

    @staticmethod
    def _simulate(gamma, eta, q, n_iv=200, seed=0):
        rng = np.random.default_rng(seed)
        se1 = np.full(n_iv, 0.02)
        se2 = np.full(n_iv, 0.02)
        b1 = rng.normal(0, 0.08, n_iv)
        Z = rng.random(n_iv) < q
        theta = rng.normal(0, 0.02, n_iv) * (rng.random(n_iv) < 0.3)
        bh1 = b1 + rng.normal(0, se1)
        bh2 = gamma * b1 + eta * Z * b1 + theta + rng.normal(0, se2)
        return bh1, se1, bh2, se2

    def test_causal_pair_detected(self):
        from cigwas_tpu.mr.cause import cause_fit

        fit = cause_fit(*self._simulate(0.3, 0.0, 0.0))
        assert fit.p_value < 0.05  # causal model predicts better
        assert 0.1 < fit.gamma_median < 0.5
        assert fit.elpd_causal > fit.elpd_sharing

    def test_shared_confounding_not_called_causal(self):
        from cigwas_tpu.mr.cause import cause_fit

        fit = cause_fit(*self._simulate(0.0, 0.4, 0.3))
        assert fit.p_value > 0.1  # sharing explains the data
        assert abs(fit.gamma_median) < 0.1
        assert fit.eta_median > 0.1  # correlated pleiotropy picked up

    def test_null_pair(self):
        from cigwas_tpu.mr.cause import cause_fit

        fit = cause_fit(*self._simulate(0.0, 0.0, 0.0))
        assert fit.p_value > 0.1
        assert abs(fit.gamma_median) < 0.1

    def test_null_z_contrast_is_calibrated(self):
        """Calibration of the FIRST documented divergence (in-sample
        posterior predictive in place of PSIS-LOO, `mr/cause.py:33-38`):
        the in-sample elpd of the richer causal model is never worse, so
        z <= 0 by construction and p <= 0.5 — the risk is
        ANTI-conservatism. Across 12 null replicates the smallest p stays
        well above 0.05 and the distribution is spread over (0, 1), i.e.
        the substitution does not manufacture causal calls (the way
        `test_mvivw_golden` pins the lmrob drift)."""
        from cigwas_tpu.mr.cause import cause_fit

        ps = [
            cause_fit(*self._simulate(0.0, 0.0, 0.0, n_iv=120, seed=s)).p_value
            for s in range(12)
        ]
        assert min(ps) > 0.05, f"anti-conservative null p: {sorted(ps)}"
        assert 0.2 < float(np.median(ps)) < 0.9
        assert max(ps) - min(ps) > 0.2  # spread, not collapsed to a point

    def test_planted_gamma_sign_and_power(self):
        """Sign/power contract on planted causal effects in both
        directions: small p, correctly-signed posterior median (prior
        shrinkage toward 0 is expected and bounded)."""
        from cigwas_tpu.mr.cause import cause_fit

        pos = cause_fit(*self._simulate(0.25, 0.0, 0.0, n_iv=200, seed=3))
        assert pos.p_value < 0.05
        assert 0.08 < pos.gamma_median < 0.45
        neg = cause_fit(*self._simulate(-0.25, 0.0, 0.0, n_iv=200, seed=4))
        assert neg.p_value < 0.05
        assert -0.45 < neg.gamma_median < -0.08

    def test_grid_refinement_stability(self, monkeypatch):
        """Calibration of the SECOND documented divergence (fixed grid in
        place of the R package's adaptive refinement, `mr/cause.py:35-38`):
        doubling the gamma/eta and q grid resolutions moves the posterior
        gamma median by less than the benchmark's reporting precision and
        leaves the causal/sharing call unchanged."""
        import cigwas_tpu.mr.cause as cause_mod
        from cigwas_tpu.mr.cause import cause_fit

        data_causal = self._simulate(0.25, 0.0, 0.0, n_iv=200, seed=3)
        data_null = self._simulate(0.0, 0.0, 0.0, n_iv=120, seed=1)
        coarse_c = cause_fit(*data_causal)
        coarse_n = cause_fit(*data_null)
        with pytest.MonkeyPatch.context() as mp:
            mp.setattr(cause_mod, "C_GRID", np.linspace(-3.0, 3.0, 241))
            mp.setattr(cause_mod, "Q_GRID", np.linspace(0.0, 1.0, 81))
            fine_c = cause_fit(*data_causal)
            fine_n = cause_fit(*data_null)
        assert abs(fine_c.gamma_median - coarse_c.gamma_median) < 0.03
        assert (fine_c.p_value < 0.05) == (coarse_c.p_value < 0.05)
        assert abs(fine_n.gamma_median - coarse_n.gamma_median) < 0.03
        assert (fine_n.p_value < 0.05) == (coarse_n.p_value < 0.05)

    def test_run_cause_analyses_rows(self):
        from cigwas_tpu.mr.cause import run_cause_analyses

        rng = np.random.default_rng(1)
        m, p = 60, 3
        effects = rng.normal(0, 0.05, (m, p))
        ses = np.full((m, p), 0.02)
        g_it = np.zeros((m, p), bool)
        g_it[:30, 0] = True  # exposure 0 has IVs; others none
        rows = run_cause_analyses(g_it, effects, ses)
        assert [(r[0], r[1]) for r in rows] == [(0, 1), (0, 2)]
        for r in rows:
            assert 0.0 <= r[3] <= 1.0
