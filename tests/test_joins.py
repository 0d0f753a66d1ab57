"""Custom join/window operators: as-of join, rolling window."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from data_profiler_ray.functions.joins import asof_join, rolling_window


def test_asof_join_vs_pandas_merge_asof():
    rng = np.random.default_rng(6)
    # left: 2000 observations across 5 keys; right: sparse rate changes
    left = pd.DataFrame({
        "key": rng.choice(["a", "b", "c", "d", "e"], 2000),
        "ts": rng.integers(0, 100_000, 2000),
    }).sort_values(["key", "ts"], kind="stable").reset_index(drop=True)
    right = pd.DataFrame({
        "key": np.repeat(["a", "b", "c", "d"], 20),  # note: no "e"
        "ts": np.concatenate([np.sort(rng.choice(100_000, 20, replace=False))
                              for _ in range(4)]),
        "rate": rng.random(80).round(3),
    })
    ds = ray.data.from_pandas(left)
    rt = pa.Table.from_pandas(right, preserve_index=False)
    out = pa.concat_tables(list(
        asof_join(ds, rt, by="key", on="ts", value_cols=["rate"])
        .iter_batches(batch_format="pyarrow"))).to_pandas()
    out = out.sort_values(["key", "ts"], kind="stable").reset_index(drop=True)

    expect = pd.merge_asof(
        left.sort_values("ts", kind="stable"),
        right.sort_values("ts", kind="stable"),
        on="ts", by="key", direction="backward"
    ).sort_values(["key", "ts"], kind="stable").reset_index(drop=True)
    got = out["rate_asof"].to_numpy()
    exp = expect["rate"].to_numpy()
    both_nan = np.isnan(got) & np.isnan(exp)
    assert (both_nan | (got == exp)).all()
    # keys absent from right stay NaN
    assert out.loc[out["key"] == "e", "rate_asof"].isna().all()


def test_rolling_window_vs_pandas():
    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "k": rng.choice(["x", "y"], 500),
        "t": np.arange(500),
        "v": rng.random(500),
    })
    ds = ray.data.from_pandas(df)
    out = pa.concat_tables(list(
        rolling_window(ds, "k", ["t"], "v", window=7)
        .iter_batches(batch_format="pyarrow"))).to_pandas()
    out = out.sort_values(["k", "t"]).reset_index(drop=True)
    expect = (df.sort_values(["k", "t"])
              .groupby("k")["v"]
              .rolling(7, min_periods=1).mean()
              .reset_index(drop=True))
    assert out["v_rolling_mean"].to_numpy() == pytest.approx(
        expect.to_numpy())


def test_range_join_partitioned_matches_broadcast():
    """Partitioned (bucketed) interval join ≡ broadcast containment on
    adversarial intervals: overlaps, duplicates, a whole-domain interval
    (replicates into every bucket), and left values outside the domain."""
    from data_profiler_ray.functions.joins import (range_join_broadcast,
                                                   range_join_partitioned)
    rng = np.random.default_rng(11)
    n_left, n_iv = 20_000, 500
    v = rng.uniform(-50, 1050, n_left)
    left = ray.data.from_arrow(pa.table({
        "row_id": pa.array(np.arange(n_left), pa.int64()),
        "val": pa.array(v, pa.float64())}))
    lo = rng.uniform(0, 1000, n_iv)
    length = rng.exponential(5.0, n_iv)
    hi = lo + length
    lo[0], hi[0] = 0.0, 1000.0          # whole-domain interval
    lo[1], hi[1] = lo[2], hi[2]         # exact duplicate interval
    iv_tbl = pa.table({
        "iv_id": pa.array(np.arange(n_iv), pa.int64()),
        "lo": pa.array(lo, pa.float64()),
        "hi": pa.array(hi, pa.float64())})

    def _pairs(ds):
        t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
        df = t.to_pandas()[["row_id", "iv_id"]]
        return df.sort_values(["row_id", "iv_id"]).reset_index(drop=True)

    got = _pairs(range_join_partitioned(
        left, ray.data.from_arrow(iv_tbl), "val", num_buckets=13))
    exp = _pairs(range_join_broadcast(left, iv_tbl, "val"))
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, exp)
