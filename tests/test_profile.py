"""Golden-profile e2e: distributed profile of parquet tables vs a pandas
oracle computed on the same data (SURVEY.md §5.2 item 2)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from data_profiler_ray.config import ProfileConfig
from data_profiler_ray.stages.profile import profile_dataset


@pytest.fixture(scope="module")
def lineitem_profile(sf_dir):
    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet")
    prof = profile_dataset(ds, ProfileConfig(title="lineitem", merge_shards=4))
    pdf = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    return prof, pdf


def _var(prof, name):
    return next(v for v in prof["variables"] if v["name"] == name)


def test_table_stats(lineitem_profile):
    prof, pdf = lineitem_profile
    assert prof["table"]["num_rows"] == len(pdf)
    assert prof["table"]["num_attributes"] == len(pdf.columns)
    assert prof["table"]["n_cells_missing"] == int(pdf.isna().sum().sum())


def test_numeric_variable_vs_pandas(lineitem_profile):
    prof, pdf = lineitem_profile
    for col in ["l_quantity", "l_extendedprice", "l_discount"]:
        v = _var(prof, col)
        s = pdf[col]
        assert v["count"] == s.count()
        assert v["mean"] == pytest.approx(s.mean())
        assert v["std"] == pytest.approx(s.std(ddof=1))
        assert v["min"] == pytest.approx(s.min())
        assert v["max"] == pytest.approx(s.max())
        assert v["sum"] == pytest.approx(s.sum(), rel=1e-9)
        assert v["skewness"] == pytest.approx(s.skew(), abs=1e-6)
        assert v["kurtosis"] == pytest.approx(s.kurt(), abs=1e-6)
        assert v["n_distinct"] == s.nunique()
        assert v["median"] == pytest.approx(s.median(), abs=1e-9)
        assert v["25%"] == pytest.approx(s.quantile(0.25), abs=1e-9)
        assert v["95%"] == pytest.approx(s.quantile(0.95), abs=1e-9)
        assert v["type"] == "Numeric"


def test_categorical_variable(lineitem_profile):
    prof, pdf = lineitem_profile
    v = _var(prof, "l_returnflag")
    s = pdf["l_returnflag"]
    assert v["type"] == "Categorical"
    assert v["n_distinct"] == s.nunique()
    vc = s.value_counts()
    fd = v["freq_value_counts"]
    for val, cnt in vc.items():
        assert fd[str(val)] == cnt


def test_datetime_variable(lineitem_profile):
    prof, pdf = lineitem_profile
    v = _var(prof, "l_shipdate")
    s = pdf["l_shipdate"]
    assert v["type"] == "DateTime"
    assert v["start"] == s.min().isoformat()
    assert v["end"] == s.max().isoformat()
    assert v["n_distinct"] == s.nunique()


def test_transcripts_profile(transcripts_dir):
    ds = ray.data.read_parquet(transcripts_dir)
    prof = profile_dataset(ds, ProfileConfig(title="transcripts"))
    pdf = pd.read_parquet(transcripts_dir)
    assert prof["table"]["num_rows"] == len(pdf)
    types = {v["name"]: v["type"] for v in prof["variables"]}
    assert types["role"] == "Categorical"
    assert types["turn_idx"] == "Numeric"
    assert types["ts"] == "DateTime"
    assert types["text"] == "Textual"
    v = _var(prof, "text")
    total_chars = pdf["text"].str.len().sum()
    assert v["num_chars"] == total_chars
    # word count vs a pandas oracle of the same regex semantics
    n_words = pdf["text"].str.findall(r"\S+").str.len().sum()
    assert v["num_words"] == n_words
    tool = _var(prof, "tool")
    assert tool["num_missing"] == pdf["tool"].isna().sum()


def test_types_dict_override(sf_dir):
    ds = ray.data.read_parquet(f"{sf_dir}/region.parquet")
    prof = profile_dataset(
        ds, ProfileConfig(types_dict={"r_name": "Textual"}, merge_shards=2))
    v = next(v for v in prof["variables"] if v["name"] == "r_name")
    assert v["type"] == "Textual"


def test_tree_reduction_multiple_levels(sf_dir):
    """merge_shards=2 on a many-block dataset forces several reduction
    levels; the result must equal the single-level path."""
    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet").repartition(16)
    prof = profile_dataset(ds, ProfileConfig(columns=["l_quantity"],
                                             merge_shards=2))
    pdf = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    v = prof["variables"][0]
    assert v["count"] == len(pdf)
    assert v["mean"] == pytest.approx(pdf["l_quantity"].mean())
    assert v["n_distinct"] == pdf["l_quantity"].nunique()
    assert v["median"] == pytest.approx(pdf["l_quantity"].median())
