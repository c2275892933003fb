"""Golden-value pins for the from-scratch X4 statistics (VERDICT r3
item 8).

Two layers of defense against silent drift in the hand-rolled
ADF/KPSS/Yeo-Johnson/periodogram code (statsmodels is absent in this
environment, so these numbers cannot be re-derived by a library at
test time):

1. **Published-table anchors** — rows lifted verbatim from the
   literature (MacKinnon 1994 response-surface critical values;
   Kwiatkowski, Phillips, Schmidt & Shin 1992 Table 1).  If the
   response-surface coefficients or the interpolation table are ever
   edited, these fail with a reference to the primary source.
2. **Seeded-series regression goldens** — exact (1e-9) pins of every
   statistic on three deterministic known-process series (stationary
   AR(1), random walk, seasonal).  These lock the *implementation*:
   any change to lag selection, detrending, or the Newey-West kernel
   moves them.  The qualitative assertions alongside each pin state
   why the pinned value is the statistically correct side of the
   decision, so a legitimate re-pin can be reviewed against them.
"""

from __future__ import annotations

import numpy as np
import pytest

from mcm_problem_f_data_wrangling_spark.operators.diagnostics import (
    acf,
    adf_pvalue,
    adf_stat,
    kpss_pvalue,
    kpss_stat,
    pacf,
    periodogram_period,
    yeo_johnson_mle,
)


# --- published-table anchors ------------------------------------------------


def test_kpss_pvalue_published_table_rows():
    # Kwiatkowski et al. (1992) Table 1, level-stationarity (eta_mu):
    # upper-tail critical values 0.347 / 0.463 / 0.574 / 0.739 at
    # 10% / 5% / 2.5% / 1%.  Interpolation must return the table
    # probabilities exactly at the table statistics.
    assert kpss_pvalue(0.347) == pytest.approx(0.10, abs=1e-12)
    assert kpss_pvalue(0.463) == pytest.approx(0.05, abs=1e-12)
    assert kpss_pvalue(0.574) == pytest.approx(0.025, abs=1e-12)
    assert kpss_pvalue(0.739) == pytest.approx(0.01, abs=1e-12)
    # clipping outside the table: very small stat -> most stationary
    # p (0.10 bound), very large stat -> 0.01 bound
    assert kpss_pvalue(0.01) == pytest.approx(0.10, abs=1e-12)
    assert kpss_pvalue(5.0) == pytest.approx(0.01, abs=1e-12)
    # monotone non-increasing in the statistic
    grid = [kpss_pvalue(s) for s in np.linspace(0.0, 1.0, 101)]
    assert all(a >= b for a, b in zip(grid, grid[1:]))


def test_adf_pvalue_mackinnon_critical_rows():
    # MacKinnon (1994) constant-only asymptotic critical values:
    # 1% -3.43, 5% -2.86, 10% -2.57.  The response surface must
    # reproduce the tail probabilities at those statistics.
    assert adf_pvalue(-3.43) == pytest.approx(0.01, abs=0.002)
    assert adf_pvalue(-2.86) == pytest.approx(0.05, abs=0.002)
    assert adf_pvalue(-2.57) == pytest.approx(0.10, abs=0.005)


def test_adf_pvalue_polynomial_seam_is_continuous():
    # MacKinnon's small-p / large-p polynomials switch at tau* = -1.61;
    # the two fits must agree there (they were published as a matched
    # pair).  A coefficient typo would open a jump at the seam.
    lo, hi = adf_pvalue(-1.61 - 1e-7), adf_pvalue(-1.61 + 1e-7)
    assert abs(lo - hi) < 2e-3
    # monotone non-decreasing across the seam region
    grid = [adf_pvalue(t) for t in np.linspace(-4.0, 1.0, 201)]
    assert all(a <= b + 1e-12 for a, b in zip(grid, grid[1:]))


# --- seeded-series regression goldens ---------------------------------------


@pytest.fixture(scope="module")
def series():
    rng = np.random.RandomState(20260814)
    e = rng.randn(240)
    ar = np.zeros(240)
    for t in range(1, 240):
        ar[t] = 0.5 * ar[t - 1] + e[t]
    rw = np.cumsum(rng.randn(240))
    seas = 10 + np.sin(2 * np.pi * np.arange(240) / 12) + 0.1 * rng.randn(240)
    return ar, rw, seas


def test_golden_stationary_ar1(series):
    ar, _, _ = series
    a = adf_stat(ar)
    k = kpss_stat(ar)
    # implementation pins (regression goldens)
    assert a == pytest.approx(-7.514092106, abs=1e-9)
    assert adf_pvalue(a) == pytest.approx(0.0, abs=1e-9)
    assert k == pytest.approx(0.207037801, abs=1e-9)
    assert kpss_pvalue(k) == pytest.approx(0.10, abs=1e-9)
    # why these are the right side: phi=0.5 AR(1) is stationary, so
    # ADF must reject the unit root hard and KPSS must NOT reject
    # stationarity at 5%
    assert a < -3.43 and k < 0.463


def test_golden_random_walk(series):
    _, rw, _ = series
    a = adf_stat(rw)
    k = kpss_stat(rw)
    assert a == pytest.approx(-2.601687196, abs=1e-9)
    assert adf_pvalue(a) == pytest.approx(0.09264906, abs=1e-8)
    assert k == pytest.approx(4.26242874, abs=1e-8)
    assert kpss_pvalue(k) == pytest.approx(0.01, abs=1e-9)
    # a unit-root path: ADF cannot reject at 5%, KPSS rejects at 1%
    assert a > -2.86 and k > 0.739


def test_golden_seasonal(series):
    ar, _, seas = series
    a = adf_stat(seas)
    assert a == pytest.approx(-3.099592444, abs=1e-9)
    assert adf_pvalue(a) == pytest.approx(0.026583364, abs=1e-8)
    assert kpss_stat(seas) == pytest.approx(0.023534587, abs=1e-9)
    # the planted 12-period cycle must dominate the periodogram
    assert periodogram_period(seas) == 12
    # AR(1) phi=0.5: lag-1 ACF estimates phi; PACF beyond lag 1 ~ 0
    assert acf(ar, 3)[1] == pytest.approx(0.512438022, abs=1e-9)
    assert pacf(ar, 3)[2] == pytest.approx(0.058578267, abs=1e-9)
    assert abs(pacf(ar, 3)[2]) < 2.5 / np.sqrt(len(ar))


def test_golden_yeo_johnson(series):
    ar, _, _ = series
    lam = yeo_johnson_mle(np.exp(0.1 * ar + 1))
    assert lam == pytest.approx(-0.4, abs=1e-9)
    # exp of a near-symmetric series is right-skewed: the MLE must
    # pick a variance-compressing lambda (< 1)
    assert lam < 1.0
