"""Spectral distribution container with inverse-CDF Monte Carlo sampling.

Parity: reference ``pvtrace/material/distribution.py`` — trapezoid CDF in
interpolation mode, step CDF in histogram mode, `__call__`/`lookup`/
`sample` trio. The precomputed (x, y, cdf) grids are exactly what the
scene compiler lowers to device tables.
"""
import numpy as np

from pvtrace_tpu.geometry.utils import allinrange


class Distribution(object):
    """Statistical distribution over a wavelength grid."""

    def __init__(self, x, y, hist=False):
        """Parameters
        ----------
        x : array-like or None
            Ascending grid values. None together with a float `y` makes a
            constant distribution.
        y : array-like or float
            Values at the grid points (vertex values; treated as bin
            counts when `hist` is True).
        hist : bool
            Sample as a histogram (no interpolation) when True.
        """
        self.hist = hist
        if x is None and isinstance(y, (float, int)):
            self._x = None
            self._y = float(y)
            return

        x = np.asarray(x, dtype=float)
        y = np.asarray(y, dtype=float)
        if not np.all(np.diff(x) > 0):
            raise ValueError("x must be sorted and ascending.")
        if not np.isfinite(y).any():
            raise ValueError("All values of y must be finite.")
        if np.any(y < 0.0):
            raise ValueError(
                "Distributions are like histograms all counts must be positive."
            )
        self._x_range = (float(np.min(x)), float(np.max(x)))
        self._x = x
        self._y = y
        if hist:
            cdf = np.cumsum(y, dtype=float)
            cdf *= 1.0 / cdf[-1]
            self._cdf = cdf
            self._edges = np.append(x, 2 * x[-1] - x[-2])
        else:
            cdf = np.cumsum((y[:-1] + y[1:]) * 0.5)
            cdf = cdf / np.max(cdf)
            self._cdf = np.concatenate([[0.0], cdf])

    def __call__(self, x):
        """Value of the distribution at `x` (interpolated or histogram)."""
        if self._x is None:
            if isinstance(x, (list, tuple, np.ndarray)):
                return np.zeros(len(x)) + self._y
            return self._y
        if not allinrange(x, self._x_range):
            raise ValueError(
                "x is outside data range.", {"x": x, "x_range": self._x_range}
            )
        if self.hist:
            idx = np.searchsorted(self._edges[:-1], x)
            return self._y[idx]
        return np.interp(x, self._x, self._y, left=np.nan, right=np.nan)

    def lookup(self, x):
        """CDF probability corresponding to the value `x`."""
        if not allinrange(x, self._x_range):
            raise ValueError(
                "x is outside data range.", {"x": x, "x_range": self._x_range}
            )
        if self.hist:
            idx = np.searchsorted(self._edges[:-1], x)
            return self._cdf[idx]
        prob = np.interp(x, self._x, self._cdf, left=np.nan, right=np.nan)
        if np.size(prob) == 1:
            return float(prob)
        return prob

    def sample(self, p):
        """Inverse-CDF sample: x-value corresponding to probability `p`."""
        if not allinrange(p, (0.0, 1.0)):
            raise ValueError("p is outside valid range.")
        if self.hist:
            idx = np.searchsorted(self._cdf, p)
            idx = np.minimum(idx, len(self._x) - 1)
            result = self._x[idx]
            if np.size(result) == 1:
                return float(np.asarray(result).ravel()[0])
            return result
        xval = np.interp(p, self._cdf, self._x, left=np.nan, right=np.nan)
        if np.size(xval) == 1:
            return float(xval)
        return xval

    @classmethod
    def from_functions(cls, x, callables, hist=False):
        """Sum of callables evaluated on grid `x` (non-finite values zeroed)."""
        x = np.asarray(x, dtype=float)
        if x.ndim != 1:
            raise ValueError("Requires a 1D array.")
        y = np.zeros(len(x))
        for f in callables:
            y_ = np.asarray(f(x), dtype=float)
            y_[~np.isfinite(y_)] = 0.0
            y += y_
        return cls(x=x, y=y, hist=hist)
