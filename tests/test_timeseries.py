"""Timeseries stats: gap-run accumulator (A14), ACF (A17), features (A16),
TF-IDF summary (M12)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data
from hypothesis import given, settings
from hypothesis import strategies as st

from data_profiler_ray.functions.text import tfidf_summary_batch
from data_profiler_ray.stages.timeseries import (acf, is_time_dependent,
                                                 series_features,
                                                 timeseries_gap_stats,
                                                 tsfresh_features)
from data_profiler_ray.state.gaps import GapState


def _oracle_gaps(mask):
    """Pandas-style oracle: run lengths of consecutive True."""
    s = pd.Series(mask)
    groups = (~s).cumsum()[s]
    if s.sum() == 0:
        return {}
    runs = groups.value_counts().value_counts().sort_index()
    out = {}
    lens = groups.value_counts()
    for ln, cnt in lens.value_counts().items():
        out[int(ln)] = int(cnt)
    return out


def test_gap_state_simple():
    st_ = GapState()
    st_.update(np.array([0, 1, 1, 0, 0, 1, 0, 1, 1, 1], dtype=bool))
    r = st_.result()
    assert r["gap_sizes"] == {1: 1, 2: 1, 3: 1}
    assert r["n_gaps"] == 3
    assert r["min_gap"] == 1 and r["max_gap"] == 3
    assert r["avg_gap"] == pytest.approx(2.0)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.booleans(), min_size=0, max_size=60),
       st.integers(min_value=1, max_value=7))
def test_gap_state_split_merge_equals_whole(bits, n_splits):
    mask = np.array(bits, dtype=bool)
    whole = GapState()
    whole.update(mask)
    # split into n chunks, update separate states, merge in order
    merged = GapState()
    chunks = np.array_split(mask, n_splits)
    for ch in chunks:
        frag = GapState()
        frag.update(ch)
        merged.merge(frag)
    assert whole.result() == merged.result()


def test_timeseries_gap_stats_vs_pandas():
    rng = np.random.default_rng(3)
    n = 5000
    ts = pd.date_range("2025-01-01", periods=n, freq="min")
    v1 = rng.standard_normal(n)
    v1[rng.random(n) < 0.1] = np.nan
    v2 = rng.standard_normal(n)  # no gaps
    df = pd.DataFrame({"ts": ts, "v1": v1, "v2": v2}).sample(
        frac=1.0, random_state=0)  # shuffled input; stage must sort
    ds = ray.data.from_pandas(df)
    out = timeseries_gap_stats(ds, ["v1", "v2"], "ts")
    ordered = df.sort_values("ts")
    mask = ordered["v1"].isna().to_numpy()
    expect = _oracle_gaps(mask)
    assert out["v1"]["gap_sizes"] == expect
    assert out["v2"]["n_gaps"] == 0


def test_acf_matches_numpy_corrcoef():
    rng = np.random.default_rng(1)
    x = np.sin(np.arange(500) * 2 * np.pi / 24) + rng.standard_normal(500) * .1
    a = acf(x, nlags=30)
    assert a[0] == 1.0
    assert a[24] > 0.5          # strong seasonality at lag 24
    assert is_time_dependent(x)
    noise = rng.standard_normal(500)
    assert abs(acf(noise, nlags=30)[24]) < 0.2


def test_tsfresh_features():
    x = np.array([1.0, 2.0, 1.0, 3.0, 1.0])
    f = tsfresh_features(x)
    assert f["abs_energy"] == pytest.approx(16.0)
    assert f["abs_sum_changes"] == pytest.approx(6.0)
    assert f["count_above_mean"] == 2
    assert f["count_below_mean"] == 3
    assert f["n_peaks"] == 2


def test_series_features_per_group():
    rng = np.random.default_rng(7)
    rows = []
    for sid in ["a", "b"]:
        base = np.sin(np.arange(200) * 2 * np.pi / 12) if sid == "a" else \
            rng.standard_normal(200)
        for i, v in enumerate(base):
            rows.append({"sid": sid, "ts": i, "v": float(v)})
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = series_features(ds, "v", "ts", series_col="sid").to_pandas()
    out = out.set_index("series")
    assert bool(out.loc["a", "time_dependent"])
    assert out.loc["a", "n"] == 200


def test_tfidf_summary():
    long_doc = (
        "Ray Data is a scalable data processing library. " * 3
        + "The streaming executor pipelines blocks with backpressure. "
        + "Penguins waddle across the frozen antarctic shore at dawn. "
        + "Ray Data is a scalable data processing library. " * 3)
    short_doc = "Short text."
    tbl = pa.table({"text": pa.array([long_doc, short_doc, None])})
    out = tfidf_summary_batch(tbl)
    summaries = out["summary"].to_pylist()
    assert summaries[1] == short_doc          # short docs pass through
    assert summaries[2] is None
    assert len(summaries[0]) < len(long_doc)  # extractive subset
    assert "Penguins" in summaries[0] or "backpressure" in summaries[0]


def test_seasonality_periods():
    from data_profiler_ray.stages.timeseries import seasonality_periods
    x = np.sin(np.arange(600) * 2 * np.pi / 24) \
        + 0.3 * np.sin(np.arange(600) * 2 * np.pi / 7)
    periods = seasonality_periods(x)
    assert 24 in periods and 7 in periods
    noise = np.random.default_rng(0).standard_normal(600)
    assert seasonality_periods(noise) == []


def test_pacf_ar1():
    """AR(1): pacf[1] ≈ φ, pacf[k>1] ≈ 0 (the Durbin-Levinson signature)."""
    from data_profiler_ray.stages.timeseries import pacf
    rng = np.random.default_rng(12)
    phi = 0.7
    x = np.zeros(4000)
    for i in range(1, x.size):
        x[i] = phi * x[i - 1] + rng.standard_normal()
    p = pacf(x, nlags=8)
    assert p[0] == 1.0
    assert abs(p[1] - phi) < 0.06
    assert np.all(np.abs(p[2:]) < 0.08)


def test_pacf_matches_ols_projection():
    """pacf[k] equals the last coefficient of an OLS AR(k) fit (up to the
    biased-ACF estimator's O(1/n) difference)."""
    from data_profiler_ray.stages.timeseries import pacf
    rng = np.random.default_rng(5)
    x = rng.standard_normal(3000)
    x = x + 0.5 * np.r_[0.0, x[:-1]] - 0.3 * np.r_[0.0, 0.0, x[:-2]]
    p = pacf(x, nlags=4)
    for k in (1, 2, 3):
        xd = x - x.mean()
        rows = [xd[k - j - 1: xd.size - j - 1] for j in range(k)]
        X = np.column_stack(rows)
        y = xd[k:]
        beta = np.linalg.lstsq(X, y, rcond=None)[0]
        assert abs(p[k] - beta[-1]) < 0.05, k


def test_adf_numpy_stationary_vs_random_walk():
    from data_profiler_ray.stages.timeseries import (adf_pvalue_numpy,
                                                     stationarity_pvalue)
    rng = np.random.default_rng(3)
    n = 1500
    ar1 = np.zeros(n)
    for i in range(1, n):
        ar1[i] = 0.5 * ar1[i - 1] + rng.standard_normal()
    walk = np.cumsum(rng.standard_normal(n))
    p_st = adf_pvalue_numpy(ar1)
    p_rw = adf_pvalue_numpy(walk)
    assert p_st is not None and p_st < 0.05    # stationary: reject unit root
    assert p_rw is not None and p_rw > 0.10    # random walk: cannot reject
    # stationarity_pvalue never returns None for long series in this env
    assert stationarity_pvalue(ar1) is not None
