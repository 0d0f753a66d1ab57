"""Constraint tests: inject known violations, assert exact violation rows and
per-conversation verdicts (SURVEY.md §5.2 item 3)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from data_profiler_ray.config import ConstraintConfig
from data_profiler_ray.stages.constraints import (
    conversation_checks, row_violations, split_verdicts)
from data_profiler_ray.synthetic import TOOL_REGISTRY


@pytest.fixture(scope="module")
def cfg():
    return ConstraintConfig(tool_registry=TOOL_REGISTRY)


def _collect(ds):
    from data_profiler_ray.stages.constraints import VIOLATION_SCHEMA
    tables = [b for b in ds.iter_batches(batch_format="pyarrow")]
    if not tables:
        return VIOLATION_SCHEMA.empty_table()
    return pa.concat_tables([t.cast(VIOLATION_SCHEMA) for t in tables])


def test_clean_transcripts_all_pass(transcripts_dir, cfg):
    ds = ray.data.read_parquet(transcripts_dir)
    violations, verdicts = split_verdicts(
        _collect(conversation_checks(ds, cfg)))
    assert violations.num_rows == 0
    v = verdicts.to_pandas()
    pdf = pd.read_parquet(transcripts_dir)
    assert len(v) == pdf["conv_id"].nunique()
    assert v["passed"].all()
    assert v["n_turns"].sum() == len(pdf)
    rv = _collect(row_violations(ds, cfg))
    assert rv.num_rows == 0


def test_dirty_transcripts_violations(dirty_transcripts_dir, cfg):
    ds = ray.data.read_parquet(dirty_transcripts_dir)
    pdf = pd.read_parquet(dirty_transcripts_dir)
    violations, verdicts = split_verdicts(
        _collect(conversation_checks(ds, cfg)))
    vdf = violations.to_pandas()
    vv = verdicts.to_pandas()

    # oracle: duplicate (conv_id, turn_idx) pairs
    dup_pairs = pdf.groupby(["conv_id", "turn_idx"]).size()
    dup_pairs = dup_pairs[dup_pairs > 1]
    got_dup = vdf[vdf["kind"] == "duplicate_key"]
    assert set(map(tuple, got_dup[["conv_id", "turn_idx"]].values)) == set(
        dup_pairs.index)
    assert vv["n_duplicate_key"].sum() == int((dup_pairs - 1).sum())

    # oracle: bad roles
    bad_role = pdf[~pdf["role"].isin(cfg.role_domain)]
    assert vv["n_bad_role"].sum() == len(bad_role)
    rv = _collect(row_violations(ds, cfg)).to_pandas()
    got_roles = rv[rv["kind"] == "bad_role"]
    assert len(got_roles) == len(bad_role)
    assert set(got_roles["value"].unique()) == set(bad_role["role"].unique())

    # oracle: dangling tools
    dangling = pdf[pdf["tool"].notna() & ~pdf["tool"].isin(TOOL_REGISTRY)]
    assert vv["n_dangling_tool"].sum() == len(dangling)
    got_tools = rv[rv["kind"] == "dangling_tool"]
    assert set(map(tuple, got_tools[["conv_id", "turn_idx"]].values)) == set(
        map(tuple, dangling[["conv_id", "turn_idx"]].values))

    # oracle: ts regressions per conversation (sorted by turn_idx, stable)
    def count_reg(g):
        g = g.sort_values("turn_idx", kind="stable")
        return int((g["ts"].astype("int64").diff() < 0).sum())
    exp_reg = pdf.groupby("conv_id").apply(count_reg, include_groups=False).sum()
    assert vv["n_ts_regression"].sum() == exp_reg

    # turn gaps exist (gap_frac>0) and verdicts fail where expected
    assert vv["n_turn_gap"].sum() > 0
    failing = vv[~vv["passed"]]
    assert len(failing) > 0
    tallies = vv[["n_duplicate_key", "n_turn_gap", "n_ts_regression",
                  "n_bad_role", "n_dangling_tool"]].sum(axis=1)
    assert ((tallies > 0) == ~vv["passed"]).all()


def test_turn_gap_detection_exact(cfg):
    tbl = pa.table({
        "conv_id": pa.array(["c1"] * 4 + ["c2"] * 3),
        "turn_idx": pa.array([0, 1, 3, 4, 0, 1, 2], pa.int32()),
        "role": pa.array(["user", "assistant"] * 3 + ["user"]),
        "text": pa.array(["x"] * 7),
        "tool": pa.array([None] * 7, pa.string()),
        "ts": pa.array(
            np.arange(7) * 1_000_000,
            pa.timestamp("us")),
    })
    ds = ray.data.from_arrow(tbl)
    violations, verdicts = split_verdicts(
        _collect(conversation_checks(ds, cfg)))
    vdf = violations.to_pandas()
    gaps = vdf[vdf["kind"] == "turn_gap"]
    # c1 has turns {0,1,3,4}: missing 2,3 expected-range mismatch → indices
    # missing from 0..3 = {2}, extra beyond range = {4}
    assert set(gaps["turn_idx"]) == {2, 4}
    v = verdicts.to_pandas().set_index("conv_id")
    assert not v.loc["c1", "passed"]
    assert v.loc["c2", "passed"]


def test_bucketed_checks_match_sorted_path(dirty_transcripts_dir, cfg):
    from data_profiler_ray.stages.constraints import conversation_checks_bucketed
    ds = ray.data.read_parquet(dirty_transcripts_dir)
    v1, d1 = split_verdicts(_collect(conversation_checks(ds, cfg)))
    v2, d2 = split_verdicts(_collect(conversation_checks_bucketed(ds, cfg)))
    a = d1.to_pandas().sort_values("conv_id").reset_index(drop=True)
    b = d2.to_pandas().sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    va = v1.to_pandas().sort_values(["kind", "conv_id", "turn_idx"]).reset_index(drop=True)
    vb = v2.to_pandas().sort_values(["kind", "conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(va[["kind", "conv_id", "turn_idx"]],
                                  vb[["kind", "conv_id", "turn_idx"]])


def test_bucketed_checks_with_row_violations(dirty_transcripts_dir, cfg):
    from data_profiler_ray.stages.constraints import conversation_checks_bucketed
    ds = ray.data.read_parquet(dirty_transcripts_dir)
    out = _collect(conversation_checks_bucketed(ds, cfg,
                                                emit_row_violations=True))
    viol, verd = split_verdicts(out)
    pdf = pd.read_parquet(dirty_transcripts_dir)
    vdf = viol.to_pandas()
    bad_role = pdf[~pdf["role"].isin(cfg.role_domain)]
    assert len(vdf[vdf["kind"] == "bad_role"]) == len(bad_role)
    dangling = pdf[pdf["tool"].notna()
                   & ~pdf["tool"].isin(cfg.tool_registry)]
    assert len(vdf[vdf["kind"] == "dangling_tool"]) == len(dangling)
