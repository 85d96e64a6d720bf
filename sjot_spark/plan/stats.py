"""Pure-numpy statistical kernels for drift checks.

scipy is not a dependency: the regularized incomplete gamma (for the
chi-square survival function) and the two-sample KS tail are
implemented directly from their standard series/continued-fraction
definitions (Abramowitz & Stegun 6.5 / 26.4; Marsaglia-Tsang-Wang for
the KS tail would be overkill — the asymptotic Kolmogorov series is
standard and adequate for histogram-scale n).

These run DRIVER-SIDE or inside applyInPandas on tiny pre-aggregated
histograms — never on raw rows.
"""

from __future__ import annotations

import math

import numpy as np


def _gamma_p_series(a: float, x: float, eps: float = 1e-14, itmax: int = 500) -> float:
    """Lower regularized incomplete gamma P(a,x) by series (x < a+1)."""
    if x <= 0:
        return 0.0
    ap = a
    term = 1.0 / a
    total = term
    for _ in range(itmax):
        ap += 1.0
        term *= x / ap
        total += term
        if abs(term) < abs(total) * eps:
            break
    return total * math.exp(-x + a * math.log(x) - math.lgamma(a))


def _gamma_q_contfrac(a: float, x: float, eps: float = 1e-14, itmax: int = 500) -> float:
    """Upper regularized incomplete gamma Q(a,x) by continued fraction
    (x >= a+1), modified Lentz's method."""
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, itmax + 1):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < eps:
            break
    return h * math.exp(-x + a * math.log(x) - math.lgamma(a))


def gammainc_q(a: float, x: float) -> float:
    """Upper regularized incomplete gamma Q(a, x) = 1 - P(a, x)."""
    if x < 0 or a <= 0:
        raise ValueError("gammainc_q requires x>=0, a>0")
    if x == 0:
        return 1.0
    if x < a + 1.0:
        return 1.0 - _gamma_p_series(a, x)
    return _gamma_q_contfrac(a, x)


def chi2_sf(stat: float, dof: int) -> float:
    """Chi-square survival function P(X >= stat)."""
    if dof <= 0:
        return 1.0
    return gammainc_q(dof / 2.0, stat / 2.0)


def chi2_test(observed: np.ndarray, expected: np.ndarray) -> tuple[float, float, int]:
    """TWO-SAMPLE chi-square: both histograms are samples (the
    baseline profile is an earlier sample of the population, not an
    exact expectation), so the statistic is
        sum ( sqrt(N2/N1)*R_i - sqrt(N1/N2)*S_i )^2 / (R_i + S_i)
    over buckets with R_i+S_i > 0, dof = #buckets - 1. A one-sample
    (goodness-of-fit) formulation would double-count sampling noise
    and reject identical distributions. Returns (stat, pvalue, dof)."""
    r = np.asarray(observed, dtype=np.float64)
    s = np.asarray(expected, dtype=np.float64)
    n1, n2 = r.sum(), s.sum()
    if n1 == 0 or n2 == 0:
        return 0.0, 1.0, 0
    keep = (r + s) > 0
    r, s = r[keep], s[keep]
    k1 = math.sqrt(n2 / n1)
    k2 = math.sqrt(n1 / n2)
    stat = float((((k1 * r - k2 * s) ** 2) / (r + s)).sum())
    dof = max(len(r) - 1, 1)
    return stat, chi2_sf(stat, dof), dof


def ks_tail(lam: float, terms: int = 101) -> float:
    """Kolmogorov distribution tail Q_KS(lambda) = 2 sum (-1)^(j-1)
    exp(-2 j^2 lambda^2)."""
    if lam <= 0:
        return 1.0
    total = 0.0
    for j in range(1, terms):
        term = 2.0 * ((-1.0) ** (j - 1)) * math.exp(-2.0 * j * j * lam * lam)
        total += term
        if abs(term) < 1e-12:
            break
    return min(max(total, 0.0), 1.0)


def ks_2samp_from_hist(
    counts1: np.ndarray, counts2: np.ndarray
) -> tuple[float, float]:
    """Two-sample KS on binned data: D = max |ECDF1 - ECDF2| over
    bucket edges; asymptotic p-value with the standard effective-n
    correction. Conservative for binned data (binning can only lower
    D). Returns (D, pvalue)."""
    c1 = np.asarray(counts1, dtype=np.float64)
    c2 = np.asarray(counts2, dtype=np.float64)
    n1, n2 = c1.sum(), c2.sum()
    if n1 == 0 or n2 == 0:
        return 0.0, 1.0
    d = float(np.abs(np.cumsum(c1) / n1 - np.cumsum(c2) / n2).max())
    ne = n1 * n2 / (n1 + n2)
    lam = (math.sqrt(ne) + 0.12 + 0.11 / math.sqrt(ne)) * d
    return d, ks_tail(lam)


def psi_from_hist(
    observed: np.ndarray, expected: np.ndarray, eps: float = 1e-6
) -> float:
    """Population Stability Index over binned data:
    PSI = sum (p_obs - p_exp) * ln(p_obs / p_exp), proportions floored
    at ``eps`` so empty buckets contribute a large-but-finite term.
    Industry thresholds: < 0.1 stable, 0.1-0.25 drifting, > 0.25
    shifted — the drift clause's ``alpha`` is the PSI fail threshold
    for this test (not a p-value)."""
    o = np.asarray(observed, dtype=np.float64)
    e = np.asarray(expected, dtype=np.float64)
    if o.sum() == 0 or e.sum() == 0:
        return 0.0
    po = np.maximum(o / o.sum(), eps)
    pe = np.maximum(e / e.sum(), eps)
    return float(np.sum((po - pe) * np.log(po / pe)))
