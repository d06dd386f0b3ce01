"""Robust locally-weighted regression (lowess) — vectorized NumPy kernel.

Fresh implementation of the Cleveland (1979) lowess algorithm with the
reference's configuration surface (insar/timeseries.py:928-1009, which
delegates to apertools.lowess): a *minimum weighted time span* instead of a
point fraction (``min_x_weighted`` — the reference default is 2*365.25
day-numbers), and ``it`` bisquare robustness iterations.

Neighborhood: all points within ±min_x_weighted/2 of x_i (expanded to the
two nearest points when fewer than 2 fall inside); tricube distance
weights; weighted linear fit evaluated at x_i; ``it`` bisquare
re-weighting passes.

The fit is vectorized: neighborhoods are contiguous index ranges, so a
chunked 2-D gather evaluates every point's weighted regression with
einsum-style row reductions — no per-point Python loop. Chunking bounds
memory at chunk × max-window doubles (mega-series safe).
"""

from __future__ import annotations

import numpy as np


def _windows(x: np.ndarray, half_span: float) -> tuple[np.ndarray, np.ndarray]:
    n = len(x)
    lo = np.searchsorted(x, x - half_span, side="left")
    hi = np.searchsorted(x, x + half_span, side="right")
    # ensure at least 2 points per window
    needs = (hi - lo) < 2
    lo = np.where(needs & (lo > 0), lo - 1, lo)
    hi = np.where((hi - lo) < 2, np.minimum(hi + 1, n), hi)
    lo = np.where((hi - lo) < 2, np.maximum(hi - 2, 0), lo)
    return lo.astype(np.int64), hi.astype(np.int64)


def lowess_xy(
    x: np.ndarray,
    y: np.ndarray,
    frac: float | None = None,
    min_x_weighted: float | None = None,
    it: int = 2,
    chunk: int = 512,
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

    if min_x_weighted is not None:
        lo, hi = _windows(x, min_x_weighted / 2.0)
    else:
        k = max(2, int(np.ceil(frac * n)))
        centers = np.arange(n)
        lo = np.clip(centers - k // 2, 0, n - k)
        hi = lo + k

    delta = np.ones(n)
    out = y.copy()
    for _iteration in range(it + 1):
        for c0 in range(0, n, chunk):
            c1 = min(c0 + chunk, n)
            lo_c, hi_c = lo[c0:c1], hi[c0:c1]
            kmax = int((hi_c - lo_c).max())
            idx = lo_c[:, None] + np.arange(kmax)[None, :]
            valid = idx < hi_c[:, None]
            idx = np.minimum(idx, n - 1)
            xi = x[idx]
            yi = y[idx]
            d = np.abs(xi - x[c0:c1, None])
            dmax = np.max(np.where(valid, d, 0.0), axis=1, keepdims=True)
            dmax[dmax == 0] = 1.0
            w = (1.0 - np.minimum(d / dmax, 1.0) ** 3) ** 3
            w = w * delta[idx] * valid
            sw = w.sum(axis=1)
            dead = sw <= 0
            if dead.any():
                # whole neighborhood robust-zeroed: fall back to the
                # distance-only fit rather than trusting the flagged point
                w0 = ((1.0 - np.minimum(d / dmax, 1.0) ** 3) ** 3) * valid
                w = np.where(dead[:, None], w0, w)
                sw = w.sum(axis=1)
            xm = (w * xi).sum(axis=1) / sw
            ym = (w * yi).sum(axis=1) / sw
            xc = xi - xm[:, None]
            sxx = (w * xc * xc).sum(axis=1)
            sxy = (w * xc * (yi - ym[:, None])).sum(axis=1)
            flat = sxx <= 1e-12 * np.maximum(1.0, xm * xm)
            b = np.where(flat, 0.0, sxy / np.where(flat, 1.0, sxx))
            out[c0:c1] = ym + b * (x[c0:c1] - xm)
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
