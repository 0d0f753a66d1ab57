"""Model-free NLP stage tests (M7/M9/M10/M11 equivalents)."""

import pyarrow as pa

from data_profiler_ray.functions.text_nlp import (clean_text_batch, ner_batch,
                                                  sentiment_batch,
                                                  topic_tokens_batch)


def test_clean_text():
    tbl = pa.table({"text": pa.array(
        ["The QUICK-thinking dogs, jumped!", None, "a the of"])})
    out = clean_text_batch(tbl)["text_clean"].to_pylist()
    assert "," not in out[0] and "!" not in out[0]
    assert "the" not in out[0].split()          # stopword removed
    assert "dog" in out[0].split()              # stemmed dogs -> dog
    assert "quick" in out[0].split()            # hyphen split + lowered
    assert out[1] is None
    assert out[2] == ""                          # all stopwords


def test_sentiment():
    tbl = pa.table({"text": pa.array([
        "this is good great excellent love it",
        "bad terrible awful hate broken error",
        "neutral words about tables and chairs",
        ""])})
    s = sentiment_batch(tbl)["sentiment"].to_pylist()
    assert s[0] > 0.5
    assert s[1] < -0.5
    assert abs(s[2]) < 0.2
    assert s[3] == 0.0


def test_ner():
    tbl = pa.table({"text": pa.array([
        "Contact Alice Johnson at alice@example.com or visit "
        "https://example.com about invoice 42."])})
    ents = ner_batch(tbl)["entities"].to_pylist()[0]
    labels = {(e["text"], e["label"]) for e in ents}
    assert ("alice@example.com", "EMAIL") in labels
    assert ("42", "CARDINAL") in labels
    assert any(l == "URL" for _, l in labels)
    assert ("Alice Johnson", "ENTITY") in labels


def test_topic_tokens():
    tbl = pa.table({"text": pa.array(
        ["spark ray ray data data data processing engine", None])})
    topics = topic_tokens_batch(tbl, k=3)["topic_tokens"].to_pylist()
    assert topics[0][0] == "data"
    assert topics[0][1] == "ray"
    assert topics[1] == []
