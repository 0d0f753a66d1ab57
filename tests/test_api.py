"""API surface tests: readers, config dispatch, text corpus rollup."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from data_profiler_ray.api import (profile_tabular, profile_text,
                                   profile_timeseries, run_profile,
                                   type_detection)
from data_profiler_ray.sources.readers import read_tabular, write_profile_json


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("csv") / "sample.csv"
    df = pd.DataFrame({
        "id": range(100),
        "flag": (["yes", "no"] * 50),
        "cat": (["a", "b", "c", "d"] * 25),
        "val": np.linspace(0, 1, 100),
        "when": pd.date_range("2025-01-01", periods=100, freq="h")
        .strftime("%Y-%m-%d %H:%M:%S"),
    })
    df.to_csv(p, index=False)
    return str(p)


def test_read_tabular_csv(csv_path):
    ds = read_tabular(csv_path)
    assert ds.count() == 100
    assert set(ds.schema().names) == {"id", "flag", "cat", "val", "when"}


def test_type_detection_csv(csv_path):
    types = type_detection(csv_path)
    assert types["flag"] == "Boolean"
    assert types["cat"] == "Categorical"
    assert types["val"] == "Numeric"
    assert types["when"] == "DateTime"


def test_profile_tabular_with_override(csv_path):
    prof = profile_tabular(csv_path, types_dict={"flag": "Categorical"})
    v = {x["name"]: x for x in prof["variables"]}
    assert v["flag"]["type"] == "Categorical"
    assert prof["table"]["num_rows"] == 100
    assert prof["table"]["profiler_type"] == "Tabular"


def test_profile_timeseries_sorts(tmp_path):
    df = pd.DataFrame({
        "when": pd.date_range("2025-01-01", periods=50, freq="D")[::-1],
        "v": np.arange(50, dtype=float),
    })
    p = str(tmp_path / "ts.parquet")
    df.to_parquet(p, index=False)
    prof = profile_timeseries(p, ts_mode_datetime_col="when")
    assert prof["table"]["profiler_type"] == "TimeSeries"
    v = {x["name"]: x for x in prof["variables"]}
    assert v["when"]["type"] == "DateTime"
    assert v["when"]["n_distinct"] == 50


def test_run_profile_config_and_json(csv_path, tmp_path):
    out_json = str(tmp_path / "out" / "profile.json")
    prof = run_profile({
        "input": {"files": csv_path, "header": 0, "sep": ","},
        "output": {"json": out_json},
        "profile": {"type": "tabular"},
    })
    assert os.path.exists(out_json)
    import json
    with open(out_json) as f:
        loaded = json.load(f)
    assert loaded["table"]["num_rows"] == prof["table"]["num_rows"] == 100


def test_run_profile_unknown_type(csv_path):
    with pytest.raises(ValueError, match="unsupported profile type"):
        run_profile({"input": {"files": csv_path}, "output": {},
                     "profile": {"type": "raster"}})


def test_text_corpus_profile(sf_dir):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    prof = profile_text(ds)
    c = prof["corpus"]
    pdf = pd.read_parquet(f"{sf_dir}/documents.parquet")
    assert c["num_texts"] == len(pdf)
    expect_words = pdf["text"].str.findall(r"\S+").str.len().sum()
    assert c["num_words"] == expect_words
    assert c["num_characters"] == pdf["text"].str.len().sum()
    # distinct words exact at this scale
    distinct = len(set(" ".join(pdf["text"].str.lower()).split()))
    assert c["num_distinct_words"] == distinct
    assert sum(b for b in c["sentiment"]["buckets"].values()) == len(pdf)
    assert abs(sum(c["languages"].values()) - 1.0) < 1e-9
    top = c["term_frequency"][0]
    vc = pd.Series(" ".join(pdf["text"].str.lower()).split()).value_counts()
    assert top["term"] == vc.index[0]
    assert top["count"] == vc.iloc[0]


def test_write_profile_json_numpy_coercion(tmp_path):
    p = str(tmp_path / "x.json")
    write_profile_json({"a": np.int64(3), "b": np.float32(0.5),
                        "c": np.array([1, 2]), "d": {1, 2}}, p)
    import json
    with open(p) as f:
        d = json.load(f)
    assert d == {"a": 3, "b": 0.5, "c": [1, 2], "d": [1, 2]}


def test_profile_hierarchical(tmp_path):
    import json
    from data_profiler_ray.pipelines.hierarchical import profile_hierarchical
    p = str(tmp_path / "nested.json")
    with open(p, "w") as f:
        for i in range(50):
            f.write(json.dumps({
                "id": i,
                "user": {"name": f"u{i}", "address": {"city": "x", "zip": i}},
                "tags": ["a", "b"],
            }) + "\n")
    prof = profile_hierarchical(p)
    names = {v["name"] for v in prof["variables"]}
    assert {"id", "user.name", "user.address.city", "user.address.zip",
            "tags"} <= names
    assert prof["table"]["profiler_type"] == "Hierarchical"
    assert prof["table"]["depth"]["max_level"] == 3
    assert prof["table"]["depth"]["attributes_per_level"][3] == 2
    v = {x["name"]: x for x in prof["variables"]}
    assert v["id"]["uniqueness_ratio"] == 1.0
    assert v["user.address.city"]["uniqueness_ratio"] < 0.1


def test_profile_timeseries_detects_timedependence(tmp_path):
    rng = np.random.default_rng(4)
    n = 2000
    df = pd.DataFrame({
        "when": pd.date_range("2025-01-01", periods=n, freq="h"),
        "seasonal": np.sin(np.arange(n) * 2 * np.pi / 24)
        + rng.standard_normal(n) * 0.1,
        "noise": rng.standard_normal(n),
    })
    p = str(tmp_path / "ts2.parquet")
    df.to_parquet(p, index=False)
    prof = profile_timeseries(p, ts_mode_datetime_col="when")
    v = {x["name"]: x for x in prof["variables"]}
    assert v["seasonal"]["type"] == "TimeSeries"
    assert v["noise"]["type"] == "Numeric"


def test_extra_geometry_columns(tmp_path):
    import pyarrow as pa
    from data_profiler_ray.sources.readers import read_tabular
    csv = tmp_path / "pois.csv"
    csv.write_text("name,lat,lon\na,40.5,-3.25\nb,41.123456789,2.0\nc,,-1.0\n")
    ds = read_tabular(str(csv), extra_geometry_columns=[
        {"latitude": "lat", "longitude": "lon"}])
    out = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    wkt = out["geometry_lon_lat"].to_pylist()
    assert wkt[0] == "POINT (-3.25 40.5)"
    assert wkt[1] == "POINT (2 41.123457)"   # 6-decimal, trimmed
    assert wkt[2] is None                     # null lat -> null geometry
