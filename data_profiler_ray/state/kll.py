"""KLL-style mergeable quantile sketch.

The reference computes exact quantiles with ``series.quantile`` on the whole
column in RAM (``/root/reference/stelardataprofiler/tabular_timeseries/variables/numeric.py:46-51``);
at 10^12-row scale that is impossible, so percentile/median/IQR/MAD fields are
served by this fixed-size mergeable sketch (per SURVEY.md §2.5 A5/A13).

Properties:
- bounded memory: ~``k * levels`` items regardless of stream length;
- associative merge (per-block partials combine in a tree reduction);
- deterministic: the compaction "coin" is a counter, not an RNG, so repeated
  runs produce identical sketches;
- **exact while small**: until the first compaction the sketch holds every
  value with weight 1 and ``quantile()`` reproduces numpy/DuckDB
  ``quantile_cont`` linear interpolation — small-scale parity tests get exact
  answers, large streams get bounded error.
"""

from __future__ import annotations

import numpy as np

DEFAULT_K = 2048


def weighted_quantile(values: np.ndarray, weights: np.ndarray, q) -> np.ndarray:
    """Exact quantile with linear interpolation over the virtual expanded
    stream (value i repeated weights[i] times) — equals numpy/pandas/DuckDB
    ``quantile_cont`` on the expanded data. Used to serve exact percentiles
    from a value-counts counter when cardinality is small."""
    qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
    v = np.asarray(values, dtype=np.float64)
    w = np.asarray(weights, dtype=np.float64)
    if v.size == 0:
        return np.full(qs.shape, np.nan)
    order = np.argsort(v, kind="mergesort")
    v, w = v[order], w[order]
    cum = np.cumsum(w)
    total = cum[-1]
    idx = np.clip(qs, 0.0, 1.0) * (total - 1)
    base = np.floor(idx)
    frac = idx - base
    i0 = np.minimum(np.searchsorted(cum, base, side="right"), v.size - 1)
    i1 = np.minimum(np.searchsorted(cum, base + 1, side="right"), v.size - 1)
    return v[i0] * (1.0 - frac) + v[i1] * frac


class KLLSketch:
    """Quantile sketch over float64 values. Items at level i carry weight 2^i."""

    __slots__ = ("k", "levels", "n", "_coin")

    def __init__(self, k: int = DEFAULT_K):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0  # total stream count (by weight)
        self._coin = 0

    # ---- update / merge ----

    def update(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64)
        if values.size:
            values = values[np.isfinite(values)]
        if values.size == 0:
            return
        self.n += int(values.size)
        self.levels[0] = np.concatenate([self.levels[0], values])
        self._compress()

    def update_weighted(self, values: np.ndarray, weights: np.ndarray) -> None:
        """Exact weighted insert: value ``i`` with integer weight ``w_i``
        lands at level ``l`` for every set bit ``l`` of ``w_i`` (a level-l
        item weighs ``2**l``), so the represented multiset equals the
        expanded stream EXACTLY — ``quantile()`` before any compaction still
        matches ``quantile_cont`` on the expanded data, and the profile fold
        pays O(#bins · log w) instead of O(#rows) for small-integer columns
        (word/char lengths fed from ``np.bincount``)."""
        v = np.asarray(values, dtype=np.float64)
        w = np.asarray(weights, dtype=np.int64)
        keep = np.isfinite(v) & (w > 0)
        if not keep.all():
            v = v[keep]
            w = w[keep]
        if v.size == 0:
            return
        self.n += int(w.sum())
        bit = 0
        wmax = int(w.max())
        while (1 << bit) <= wmax:
            sel = ((w >> bit) & 1).astype(bool)
            if sel.any():
                while len(self.levels) <= bit:
                    self.levels.append(np.empty(0, dtype=np.float64))
                self.levels[bit] = np.concatenate([self.levels[bit], v[sel]])
            bit += 1
        self._compress()

    def merge(self, other: "KLLSketch") -> None:
        self.n += other.n
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for i, arr in enumerate(other.levels):
            if arr.size:
                self.levels[i] = np.concatenate([self.levels[i], arr])
        self._coin ^= other._coin
        self._compress()

    def _capacity(self, level: int, num_levels: int) -> int:
        # geometric capacity schedule, c = 2/3 (classic KLL)
        depth = num_levels - 1 - level
        cap = int(self.k * (2.0 / 3.0) ** depth)
        return max(cap, 8)

    def _compress(self) -> None:
        total_cap = sum(self._capacity(i, len(self.levels)) for i in range(len(self.levels)))
        if sum(a.size for a in self.levels) <= max(total_cap, self.k):
            return
        # cascade with a while-loop: levels appended mid-pass are visited
        # too, so one huge update can't leave an uncompacted top level
        i = 0
        while i < len(self.levels):
            cap = self._capacity(i, len(self.levels))
            arr = self.levels[i]
            if arr.size > cap:
                arr = np.sort(arr)
                start = self._coin & 1
                self._coin += 1
                promoted = arr[start::2]
                self.levels[i] = np.empty(0, dtype=np.float64)
                if i + 1 == len(self.levels):
                    self.levels.append(np.empty(0, dtype=np.float64))
                self.levels[i + 1] = np.concatenate([self.levels[i + 1],
                                                     promoted])
            i += 1

    # ---- queries ----

    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for i, arr in enumerate(self.levels):
            if arr.size:
                vals.append(arr)
                wts.append(np.full(arr.size, float(1 << i)))
        if not vals:
            return np.empty(0), np.empty(0)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="mergesort")
        return v[order], w[order]

    def quantile(self, q) -> np.ndarray:
        """Weighted quantile with linear interpolation.

        When no compaction has occurred (all weights 1) this equals
        ``numpy.quantile(..., method="linear")`` == DuckDB ``quantile_cont``.
        """
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        v, w = self._weighted_items()
        if v.size == 0:
            return np.full(qs.shape, np.nan)
        if v.size == 1:
            return np.full(qs.shape, v[0])
        cum = np.cumsum(w)
        total = cum[-1]
        # interpolate over the virtual expanded sorted stream of `total` items;
        # expanded index j falls in item i = searchsorted(cum, j, 'right')
        idx = np.clip(qs, 0.0, 1.0) * (total - 1)
        base = np.floor(idx)
        frac = idx - base
        i0 = np.minimum(np.searchsorted(cum, base, side="right"), v.size - 1)
        i1 = np.minimum(np.searchsorted(cum, base + 1, side="right"), v.size - 1)
        return v[i0] * (1.0 - frac) + v[i1] * frac

    def median(self) -> float:
        return float(self.quantile(0.5)[0])

    def result(self) -> dict:
        """The reference's percentile bundle (numeric.py:46-58)."""
        p = self.quantile([0.05, 0.10, 0.25, 0.5, 0.75, 0.90, 0.95])
        return {
            "5%": p[0], "10%": p[1], "25%": p[2], "50%": p[3],
            "75%": p[4], "90%": p[5], "95%": p[6],
            "median": p[3], "iqr": p[4] - p[2],
        }
