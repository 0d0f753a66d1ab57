"""Timeseries stats: gap runs (A14), autocorrelation (A17), tsfresh-style
features (A16), stationarity probe (A15, import-gated).

Reference: ``/root/reference/stelardataprofiler/tabular_timeseries/
profiler.py:459-533`` (gaps), ``variables/timeseries.py:235-307`` (features,
ACF/PACF via statsmodels — here numpy-native), ``:106-116`` (ADF p<0.05 —
gated behind an import-try since statsmodels may be absent).

Execution shape: ``ds.sort(ts_col)`` (range partition → ordered blocks) →
per-block GapState fragments per column → driver merges fragments in block
order (fragment states are tiny). ACF/feature extraction needs the whole
ordered series: per-series ``map_groups`` when a series-id column exists,
else a driver-side bounded sample.
"""

from __future__ import annotations

import pickle

import numpy as np
import pyarrow as pa

import ray.data

from ..state.gaps import GapState


def timeseries_gap_stats(ds: "ray.data.Dataset", value_cols: list[str],
                         ts_col: str) -> dict[str, dict]:
    """Per-column NaN-gap stats over the ts-ordered dataset (A14)."""

    def frag(batch: pa.Table) -> pa.Table:
        states: dict[str, GapState] = {}
        for c in value_cols:
            st = GapState()
            col = batch.column(c)
            is_null = np.zeros(len(col), dtype=bool)
            arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            if arr.null_count:
                is_null |= ~np.asarray(arr.is_valid())
            if pa.types.is_floating(arr.type):
                vals = arr.to_numpy(zero_copy_only=False)
                is_null |= np.isnan(vals)
            st.update(is_null)
            states[c] = st
        ts = batch.column(ts_col)
        min_ts = ts[0].as_py() if len(ts) else None
        return pa.table({
            "min_ts": pa.array([str(min_ts)], pa.string()),
            "state": pa.array([pickle.dumps(states)], pa.large_binary()),
        })

    cols = list(value_cols) + [ts_col]
    frags = ds.select_columns(cols).sort(ts_col).map_batches(
        frag, batch_format="pyarrow", batch_size=None)
    rows = []
    for b in frags.iter_batches(batch_format="pyarrow"):
        rows.extend(zip(b.column("min_ts").to_pylist(),
                        b.column("state").to_pylist()))
    rows.sort(key=lambda r: r[0])  # fragment order = ts order
    merged: dict[str, GapState] = {c: GapState() for c in value_cols}
    for _, blob in rows:
        states = pickle.loads(blob)
        for c, st in states.items():
            merged[c].merge(st)
    return {c: merged[c].result() for c in value_cols}


def acf(x: np.ndarray, nlags: int | None = None) -> np.ndarray:
    """Numpy autocorrelation function (reference uses statsmodels acf with
    lag=min(100, n/2−1), variables/timeseries.py:262-307)."""
    x = np.asarray(x, dtype=np.float64)
    x = x[~np.isnan(x)]
    n = x.size
    if n < 2:
        return np.array([1.0])
    if nlags is None:
        nlags = min(100, n // 2 - 1)
    nlags = max(1, min(nlags, n - 1))
    xd = x - x.mean()
    denom = float((xd * xd).sum())
    if denom == 0:
        return np.ones(nlags + 1)
    out = np.empty(nlags + 1)
    out[0] = 1.0
    for k in range(1, nlags + 1):
        out[k] = float((xd[:-k] * xd[k:]).sum()) / denom
    return out


def pacf(x: np.ndarray, nlags: int | None = None) -> np.ndarray:
    """Partial autocorrelation via the Durbin–Levinson recursion over the
    sample ACF (A17 parity: reference computes PACF via statsmodels,
    variables/timeseries.py:262-307,480-481; the Levinson-Durbin path is
    the same 'ld' estimator)."""
    r = acf(x, nlags)
    nl = r.size - 1
    out = np.empty(nl + 1)
    out[0] = 1.0
    if nl == 0:
        return out
    phi_prev = np.zeros(nl + 1)
    v = 1.0
    for k in range(1, nl + 1):
        if k == 1:
            phi_k = r[1]
        else:
            phi_k = (r[k] - np.dot(phi_prev[1:k], r[1:k][::-1])) / v \
                if v > 1e-300 else 0.0
        phi_cur = phi_prev.copy()
        phi_cur[k] = phi_k
        if k > 1:
            phi_cur[1:k] = phi_prev[1:k] - phi_k * phi_prev[1:k][::-1]
        v *= max(1.0 - phi_k * phi_k, 0.0)
        out[k] = phi_k
        phi_prev = phi_cur
    return out


# Asymptotic quantiles of the Dickey–Fuller τ_μ distribution
# (constant-only case; Fuller 1976 / MacKinnon 1994 published tables)
_DF_TAU_QUANTILES = [(-3.96, 0.001), (-3.43, 0.01), (-3.12, 0.025),
                     (-2.86, 0.05), (-2.57, 0.10), (-1.57, 0.50),
                     (-0.44, 0.90), (-0.07, 0.95), (0.23, 0.975),
                     (0.60, 0.99)]


def adf_pvalue_numpy(x: np.ndarray, maxlag: int | None = None):
    """Augmented Dickey–Fuller p-value in plain numpy.

    Regression Δx_t = α + β·x_{t−1} + Σ γ_i·Δx_{t−i} + ε with the lag
    order picked by AIC over 0..maxlag (Schwert's 12·(n/100)^¼ default,
    like statsmodels); the τ statistic β̂/se(β̂) is mapped to a p-value by
    monotone log-odds interpolation of the published asymptotic τ_μ
    quantiles — approximate between grid points, exact at them, and more
    than adequate for the reference's p<0.05 stationarity flag
    (variables/timeseries.py:106-116)."""
    x = np.asarray(x, dtype=np.float64)
    x = x[~np.isnan(x)]
    n = x.size
    if n < 10:
        return None
    if maxlag is None:
        maxlag = min(int(12 * (n / 100.0) ** 0.25), n // 2 - 2)
    maxlag = max(0, maxlag)
    dx = np.diff(x)

    def fit(p: int):
        # rows: t = p .. len(dx)-1 ; columns: [1, x_{t-1}, Δx_{t-1..t-p}]
        y = dx[p:]
        m = y.size
        cols = [np.ones(m), x[p:-1]]
        for i in range(1, p + 1):
            cols.append(dx[p - i:-i])
        X = np.column_stack(cols)
        beta, res, rank, _ = np.linalg.lstsq(X, y, rcond=None)
        resid = y - X @ beta
        ssr = float(resid @ resid)
        k = X.shape[1]
        if m <= k:
            return None
        sigma2 = ssr / (m - k)
        xtx_inv = np.linalg.pinv(X.T @ X)
        se_b = np.sqrt(sigma2 * xtx_inv[1, 1])
        tau = float(beta[1] / se_b) if se_b > 0 else 0.0
        aic = m * np.log(ssr / m if ssr > 0 else 1e-300) + 2 * k
        return tau, aic

    best = None
    for p in range(0, maxlag + 1):
        r = fit(p)
        if r is None:
            continue
        if best is None or r[1] < best[1]:
            best = r
    if best is None:
        return None
    tau = best[0]
    taus = np.array([t for t, _ in _DF_TAU_QUANTILES])
    logit = np.log([q / (1 - q) for _, q in _DF_TAU_QUANTILES])
    if tau <= taus[0]:
        return 0.001
    if tau >= taus[-1]:
        return 0.99
    lo = float(np.interp(tau, taus, logit))
    return float(1.0 / (1.0 + np.exp(-lo)))


def is_time_dependent(x: np.ndarray, threshold: float = 0.1,
                      lags: tuple[int, ...] = (1, 7, 12, 24, 30)) -> bool:
    """The reference's TimeSeries-type probe (``check_if_timedependent``,
    variables/utils.py:274-285): autocorrelated above ``threshold`` at any
    of the candidate seasonal lags."""
    x = np.asarray(x, dtype=np.float64)
    x = x[~np.isnan(x)]
    if x.size < 3:
        return False
    max_lag = min(max(lags), x.size - 2)
    a = acf(x, nlags=max_lag)
    return any(abs(a[lag]) > threshold for lag in lags if lag < a.size)


def tsfresh_features(x: np.ndarray) -> dict:
    """A16 feature bundle (variables/timeseries.py:235-259,458-478):
    abs_energy, absolute_sum_of_changes, count above/below mean, peaks."""
    x = np.asarray(x, dtype=np.float64)
    x = x[~np.isnan(x)]
    if x.size == 0:
        return {"abs_energy": 0.0, "abs_sum_changes": 0.0,
                "count_above_mean": 0, "count_below_mean": 0, "n_peaks": 0}
    mean = x.mean()
    d = np.diff(x)
    # peaks: strict local maxima (numpy stand-in for number_cwt_peaks)
    peaks = 0
    if x.size >= 3:
        peaks = int(np.sum((x[1:-1] > x[:-2]) & (x[1:-1] > x[2:])))
    return {
        "abs_energy": float((x * x).sum()),
        "abs_sum_changes": float(np.abs(d).sum()) if d.size else 0.0,
        "count_above_mean": int((x > mean).sum()),
        "count_below_mean": int((x < mean).sum()),
        "n_peaks": peaks,
    }


def stationarity_pvalue(x: np.ndarray):
    """ADF p-value (A15, reference variables/timeseries.py:106-116):
    statsmodels when available, else the numpy ADF (same regression, AIC
    lag pick, interpolated τ_μ p-value) — never returns None just because
    statsmodels is absent."""
    x = np.asarray(x, dtype=np.float64)
    x = x[~np.isnan(x)]
    if x.size < 10:
        return None
    try:
        from statsmodels.tsa.stattools import adfuller
        return float(adfuller(x)[1])
    except ImportError:
        return adf_pvalue_numpy(x)


def series_features(ds: "ray.data.Dataset", value_col: str, ts_col: str,
                    series_col: str | None = None) -> pa.Table:
    """Per-series ordered feature extraction (A16/A17) via map_groups when a
    series id exists; whole dataset treated as one series otherwise (bounded
    driver sample in that case)."""

    def per_series(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        order = pc.sort_indices(group, sort_keys=[(ts_col, "ascending")])
        x = group.column(value_col).take(order).to_numpy(zero_copy_only=False)
        f = tsfresh_features(x)
        a = acf(x, nlags=min(10, max(1, x.size // 2 - 1)))
        row = {"series": (group.column(series_col)[0].as_py()
                          if series_col else "__all__"),
               "n": x.size, "acf_lag1": float(a[1]) if a.size > 1 else None,
               "time_dependent": is_time_dependent(x), **f}
        return pa.Table.from_pylist([row])

    if series_col:
        return pa.concat_tables(list(
            ds.select_columns([series_col, value_col, ts_col])
            .groupby(series_col).map_groups(per_series, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")))
    sample = pa.concat_tables(list(
        ds.select_columns([value_col, ts_col]).limit(1_000_000)
        .iter_batches(batch_format="pyarrow")))
    return per_series(sample)


def seasonality_periods(x: np.ndarray, max_periods: int = 3) -> list[int]:
    """A15 seasonality via FFT peak detection (reference is Kats-derived,
    variables/timeseries.py:119-232: PSD peaks above a MAD-based threshold,
    harmonic suppression). Returns detected period lengths, strongest first."""
    x = np.asarray(x, dtype=np.float64)
    x = x[~np.isnan(x)]
    n = x.size
    if n < 8:
        return []
    xd = x - x.mean()
    psd = np.abs(np.fft.rfft(xd)) ** 2
    freqs = np.fft.rfftfreq(n)
    psd[0] = 0.0
    med = np.median(psd)
    mad = np.median(np.abs(psd - med)) or 1.0
    # MAD outlier bar AND a minimum share of total power — white noise
    # spreads power thin, so no single bin clears the share test
    thresh = max(med + 6.0 * 1.4826 * mad, 0.05 * psd.sum())
    peaks = np.flatnonzero(
        (psd > thresh)
        & (psd >= np.roll(psd, 1)) & (psd >= np.roll(psd, -1)))
    peaks = peaks[np.argsort(-psd[peaks])]
    periods: list[int] = []
    for p in peaks:
        if freqs[p] <= 0:
            continue
        period = int(round(1.0 / freqs[p]))
        if period < 2 or period > n // 2:
            continue
        # harmonic suppression: skip integer multiples/divisors of found ones
        if any(abs(period - q) <= 1 or
               (q % period in (0, period - 1, 1)) or
               (period % q in (0, q - 1, 1)) for q in periods):
            continue
        periods.append(period)
        if len(periods) >= max_periods:
            break
    return periods
