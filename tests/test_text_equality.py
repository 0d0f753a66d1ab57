"""Per-row invariant (BASELINE.json input_hint): per-turn ``text`` equality
under stable (conv_id, turn_idx) sort — the engine's read/sort path must
reproduce the source texts exactly, in the canonical order."""

import pandas as pd
import pyarrow as pa
import ray.data

from data_profiler_ray.sources.readers import read_transcripts


def test_per_turn_text_equality_clean(transcripts_dir):
    ds = read_transcripts(transcripts_dir)
    got = pa.concat_tables(list(
        ds.sort(["conv_id", "turn_idx"])
        .iter_batches(batch_format="pyarrow"))).to_pandas()
    src = (pd.read_parquet(transcripts_dir)
           .sort_values(["conv_id", "turn_idx"], kind="stable")
           .reset_index(drop=True))
    assert len(got) == len(src)
    assert got["text"].tolist() == src["text"].tolist()
    assert got["conv_id"].tolist() == src["conv_id"].tolist()
    assert got["turn_idx"].tolist() == src["turn_idx"].tolist()
    # ts and role ride along unchanged too
    assert got["ts"].tolist() == src["ts"].tolist()


def test_per_turn_text_equality_with_duplicates(dirty_transcripts_dir):
    """Duplicates make (conv_id, turn_idx) non-unique: the multiset of
    (conv_id, turn_idx, text) rows must still match exactly."""
    ds = read_transcripts(dirty_transcripts_dir)
    got = pa.concat_tables(list(
        ds.sort(["conv_id", "turn_idx"])
        .iter_batches(batch_format="pyarrow"))).to_pandas()
    src = pd.read_parquet(dirty_transcripts_dir)
    key = ["conv_id", "turn_idx", "text"]
    got_sorted = got[key].sort_values(key, kind="stable").reset_index(drop=True)
    src_sorted = src[key].sort_values(key, kind="stable").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_sorted, src_sorted)
