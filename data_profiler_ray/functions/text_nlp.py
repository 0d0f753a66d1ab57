"""Model-free NLP batch operators covering the reference's text stages.

The reference's NLP chain relies on NLTK/spaCy/VADER/gensim models
(``/root/reference/stelardataprofiler/text/profiler.py:315-465``), none of
which exist in this environment. Each stage here is a deterministic,
dependency-free equivalent with the SAME pipeline shape (actor-pool
``map_batches`` — swap the inner function for a model call when libraries
are available):

- ``clean_text_batch``  — M7: punctuation strip (keep apostrophes, hyphen →
  space), lowercasing, stopword removal, light suffix-stripping stemmer
  (Porter-style step-1 suffixes, public algorithm);
- ``sentiment_batch``   — M9: word-list polarity score in [-1, 1] (VADER
  compound stand-in; reference ``:442-447``);
- ``ner_batch``         — M10: regex entity extraction (capitalized runs →
  ENTITY, numbers → CARDINAL, emails/URLs typed) instead of spaCy
  ``doc.ents`` (reference ``:449-465``);
- ``topic_tokens_batch``— M11: top-k frequent non-stopword tokens per doc
  (LDA num_topics=1 stand-in; reference ``:424-440`` emits one topic's
  top-10 tokens).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text import _LANG_STOPWORDS

_SUFFIXES = ("ingly", "edly", "ings", "ing", "ed", "ly", "ies", "es", "s")
_ENTITY_RE = re.compile(r"\b(?:[A-Z][a-z]+(?:\s+[A-Z][a-z]+)*)\b")
_NUM_RE = re.compile(r"\b\d+(?:\.\d+)?\b")
_EMAIL_RE = re.compile(r"\b[\w.+-]+@[\w-]+\.[\w.]+\b")
_URL_RE = re.compile(r"\bhttps?://\S+\b")


def _stem(tok: str) -> str:
    """Real Porter stemmer (memoized; see functions/stemmer.py). The old
    light suffix-stripper is kept as the fallback shape only in history —
    the chain now matches the reference's Snowball-class stemming."""
    from .stemmer import stem_memo
    return stem_memo(tok)


def clean_text_batch(batch: pa.Table, text_col: str = "text",
                     lang: str = "en") -> pa.Table:
    """M7 cleaning chain → adds ``text_clean`` (reference profiler.py:315-365:
    punctuation strip keeping apostrophes, '-'→space, stopwords, stemming)."""
    text = batch.column(text_col)
    norm = pc.replace_substring_regex(text, r"-", " ")
    norm = pc.replace_substring_regex(norm, r"[^\w\s']", "")
    norm = pc.utf8_lower(norm)
    stop = _LANG_STOPWORDS.get(lang, _LANG_STOPWORDS["en"])
    out = []
    for v in norm.to_pylist():
        if v is None:
            out.append(None)
            continue
        out.append(" ".join(_stem(t) for t in v.split() if t not in stop))
    from .text import _set_column
    return _set_column(batch, "text_clean", pa.array(out, pa.string()))


def sentiment_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """M9 polarity score per document in [-1, 1] (VADER-compound shape)."""
    from ..pipelines.text_corpus import _NEGATIVE, _POSITIVE
    from .text import _set_column, _token_lists
    flat, offsets = _token_lists(batch.column(text_col))
    n_docs = len(offsets) - 1
    scores = np.zeros(n_docs)
    if len(flat):
        doc_len = np.diff(offsets).astype(np.float64)
        has = doc_len > 0
        starts = np.clip(offsets[:-1], 0, len(flat) - 1)
        pos = pc.is_in(flat, value_set=pa.array(sorted(_POSITIVE))).cast(
            pa.int8()).to_numpy(zero_copy_only=False).astype(np.float64)
        neg = pc.is_in(flat, value_set=pa.array(sorted(_NEGATIVE))).cast(
            pa.int8()).to_numpy(zero_copy_only=False).astype(np.float64)
        p = np.where(has, np.add.reduceat(pos, starts), 0.0)
        ng = np.where(has, np.add.reduceat(neg, starts), 0.0)
        scores = np.clip((p - ng) / np.maximum(doc_len, 1.0) * 5, -1.0, 1.0)
    return _set_column(batch, "sentiment", pa.array(scores, pa.float64()))


def ner_batch(batch: pa.Table, text_col: str = "text",
              max_entities: int = 50) -> pa.Table:
    """M10 entity extraction → ``entities`` list<struct<text,label>>."""
    texts = batch.column(text_col).to_pylist()
    all_ents = []
    for doc in texts:
        if doc is None:
            all_ents.append([])
            continue
        ents = []
        for m in _URL_RE.finditer(doc):
            ents.append({"text": m.group(), "label": "URL"})
        for m in _EMAIL_RE.finditer(doc):
            ents.append({"text": m.group(), "label": "EMAIL"})
        for m in _NUM_RE.finditer(doc):
            ents.append({"text": m.group(), "label": "CARDINAL"})
        for m in _ENTITY_RE.finditer(doc):
            g = m.group()
            sent_initial = (m.start() == 0
                            or doc[max(m.start() - 2, 0):m.start()]
                            in (". ", "! ", "? "))
            if sent_initial:
                # drop the sentence-initial capitalized word: "Contact
                # Alice Johnson" → "Alice Johnson"; single-word runs are
                # probably just sentence case, skip them
                parts = g.split(None, 1)
                if len(parts) < 2:
                    continue
                g = parts[1]
            ents.append({"text": g, "label": "ENTITY"})
        all_ents.append(ents[:max_entities])
    from .text import _set_column
    typ = pa.list_(pa.struct([("text", pa.string()), ("label", pa.string())]))
    return _set_column(batch, "entities", pa.array(all_ents, typ))


def topic_tokens_batch(batch: pa.Table, text_col: str = "text",
                       k: int = 10) -> pa.Table:
    """M11 stand-in: top-k frequent non-stopword tokens per document."""
    from collections import Counter

    from .text import _set_column
    stop = _LANG_STOPWORDS["en"]
    out = []
    for doc in batch.column(text_col).to_pylist():
        if doc is None:
            out.append([])
            continue
        toks = [t for t in doc.lower().split() if t not in stop and t]
        out.append([t for t, _ in Counter(toks).most_common(k)])
    return _set_column(batch, "topic_tokens",
                       pa.array(out, pa.list_(pa.string())))
