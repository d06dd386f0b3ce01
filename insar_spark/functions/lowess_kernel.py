"""Robust locally-weighted regression (lowess) — NumPy kernel.

Fresh implementation of the Cleveland (1979) lowess algorithm with the
reference's configuration surface (insar/timeseries.py:928-1009, which
delegates to apertools.lowess): a *minimum weighted time span* instead of a
point fraction (``min_x_weighted`` — the reference default is 2*365.25
day-numbers), and ``it`` bisquare robustness iterations.

Semantics: for each x_i, take the smallest symmetric neighborhood whose x
span is >= min_x_weighted (or at least ``frac`` of points if given),
tricube-weight by distance, weighted linear fit, evaluate at x_i. Then
re-weight by bisquare of residuals and repeat ``it`` times.
"""

from __future__ import annotations

import numpy as np


def lowess_xy(
    x: np.ndarray,
    y: np.ndarray,
    frac: float | None = None,
    min_x_weighted: float | None = None,
    it: int = 2,
) -> np.ndarray:
    """Smoothed y at each x (x must be sorted ascending, no NaN)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = len(x)
    if n == 0:
        return np.empty(0)
    if n == 1:
        return y.copy()
    if frac is None and min_x_weighted is None:
        frac = 2.0 / 3.0

    # neighborhood size per point
    if min_x_weighted is not None:
        k = np.empty(n, dtype=np.int64)
        for i in range(n):
            # expand window symmetric-ish until span >= min_x_weighted
            lo, hi = i, i
            while (x[hi] - x[lo]) < min_x_weighted and (lo > 0 or hi < n - 1):
                if lo == 0:
                    hi += 1
                elif hi == n - 1:
                    lo -= 1
                elif (x[i] - x[lo - 1]) <= (x[hi + 1] - x[i]):
                    lo -= 1
                else:
                    hi += 1
            k[i] = hi - lo + 1
        k = np.maximum(k, 2)
    else:
        k = np.full(n, max(2, int(np.ceil(frac * n))), dtype=np.int64)

    delta = np.ones(n)
    out = y.copy()
    for _iteration in range(it + 1):
        for i in range(n):
            ki = min(int(k[i]), n)
            # ki nearest neighbors of x[i]
            lo = np.searchsorted(x, x[i]) - ki
            lo = max(0, min(lo, n - ki))
            best_lo = lo
            best_span = np.inf
            for cand in range(lo, min(lo + ki, n - ki) + 1):
                span = max(x[i] - x[cand], x[cand + ki - 1] - x[i])
                if span < best_span:
                    best_span = span
                    best_lo = cand
            sl = slice(best_lo, best_lo + ki)
            xi, yi = x[sl], y[sl]
            d = np.abs(xi - x[i])
            dmax = d.max()
            w0 = (1 - (d / dmax) ** 3) ** 3 if dmax > 0 else np.ones_like(d)
            w = w0 * delta[sl]
            sw = w.sum()
            if sw <= 0:
                # whole neighborhood robust-zeroed: fall back to the
                # distance-only fit rather than trusting y[i] (which is
                # exactly the point robustness flagged)
                w, sw = w0, w0.sum()
            xm = (w * xi).sum() / sw
            ym = (w * yi).sum() / sw
            sxx = (w * (xi - xm) ** 2).sum()
            if sxx <= 1e-12 * max(1.0, xm * xm):
                out[i] = ym
            else:
                b = (w * (xi - xm) * (yi - ym)).sum() / sxx
                out[i] = ym + b * (x[i] - xm)
        # bisquare robustness re-weighting
        resid = y - out
        s = np.median(np.abs(resid))
        if s <= 0:
            # degenerate: most points fit exactly — zero-weight only the
            # points that don't (pure outliers), keep the rest at 1
            delta = (np.abs(resid) <= 1e-12 * np.maximum(1.0, np.abs(y))).astype(
                np.float64
            )
            if delta.all():
                break
            continue
        delta = np.clip(resid / (6.0 * s), -1.0, 1.0)
        delta = (1 - delta**2) ** 2
    return out
