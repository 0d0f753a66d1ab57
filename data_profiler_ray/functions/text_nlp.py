"""Model-free NLP batch operators covering the reference's text stages.

The reference's NLP chain relies on NLTK/spaCy/VADER/gensim models
(``/root/reference/stelardataprofiler/text/profiler.py:315-465``), none of
which exist in this environment. Each stage here is a deterministic,
dependency-free equivalent with the SAME pipeline shape (actor-pool
``map_batches`` — swap the inner function for a model call when libraries
are available):

- ``clean_text_batch``  — M7: punctuation strip (keep apostrophes, hyphen →
  space), lowercasing, stopword removal, REAL Porter stemmer
  (functions/stemmer.py, the published 1980 algorithm);
- ``sentiment_batch``   — M9: VADER-style compound in [-1, 1] (public rule
  set: negation window, intensifier boost, exclamation emphasis,
  x/√(x²+α) normalization; reference ``:442-447``);
- ``ner_batch``         — M10: regex entity extraction (capitalized runs →
  ENTITY, numbers → CARDINAL, emails/URLs typed) instead of spaCy
  ``doc.ents`` (reference ``:449-465``);
- ``topic_tokens_batch``— M11 per-doc stand-in: top-k frequent
  non-stopword tokens (the corpus-level REAL topic model is
  ``functions/lda.py`` — distributed variational-Bayes LDA; reference
  ``:424-440``).
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


_NEGATIONS = ("not", "no", "never", "neither", "nor", "cannot", "can't",
              "don't", "doesn't", "didn't", "isn't", "wasn't", "won't",
              "wouldn't", "shouldn't", "couldn't", "ain't", "without")
_INTENSIFIERS = ("very", "really", "extremely", "absolutely", "completely",
                 "totally", "so", "incredibly", "utterly", "especially")
_NEGATION_WINDOW = 3        # a negation flips polarity of the next 3 tokens
_INTENSIFIER_BOOST = 0.293  # VADER's published B_INCR scalar


def sentiment_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """M9 polarity per document in [-1, 1], VADER-style heuristics
    (public rule set — Hutto & Gilbert 2014): word-list valence, negation
    flips within a 3-token window, intensifier boost, exclamation
    emphasis, compound normalization x/√(x²+α).

    Fully vectorized over the batch's flat token array: the negation
    window is a rolling-max of negation flags (cumulative-count trick),
    masked at document boundaries.
    """
    from ..pipelines.text_corpus import _NEGATIVE, _POSITIVE
    from .text import _set_column, _token_lists
    text = batch.column(text_col)
    flat, offsets = _token_lists(text)
    n_docs = len(offsets) - 1
    compound = np.zeros(n_docs)
    if len(flat):
        doc_len = np.diff(offsets)
        starts = np.clip(offsets[:-1], 0, len(flat) - 1)
        doc_of = np.repeat(np.arange(n_docs), doc_len)
        n_tok = len(flat)

        # strip clinging punctuation so "good!"/"bad," match the lists
        bare = pc.replace_substring_regex(flat, r"^\W+|\W+$", "")

        def _flags(words) -> np.ndarray:
            return pc.is_in(bare, value_set=pa.array(sorted(words))).cast(
                pa.int8()).to_numpy(zero_copy_only=False).astype(np.float64)

        val = _flags(_POSITIVE) - _flags(_NEGATIVE)
        neg_flag = _flags(_NEGATIONS)
        # a token acting as negation carries no valence of its own
        # ("never" sits in the negative word list too)
        val = np.where(neg_flag > 0, 0.0, val)
        intens = _flags(_INTENSIFIERS)
        # negated[i]: a negation occurred in the previous _NEGATION_WINDOW
        # tokens of the SAME document → rolling window via cumsum diff
        cs = np.concatenate([[0.0], np.cumsum(neg_flag)])
        lo = np.maximum(np.arange(n_tok) - _NEGATION_WINDOW, 0)
        # clamp the window start to the token's own document start
        lo = np.maximum(lo, np.repeat(offsets[:-1], doc_len)[:n_tok])
        window_neg = cs[np.arange(n_tok)] - cs[lo]
        negated = window_neg > 0
        # intensifier immediately before a valence token (same doc)
        boost = np.zeros(n_tok)
        if n_tok > 1:
            prev_int = np.r_[0.0, intens[:-1]]
            same_doc = np.r_[False, doc_of[1:] == doc_of[:-1]]
            boost[1:] = (prev_int[1:] * same_doc[1:])
        signed = np.where(negated, -0.74 * val, val)  # VADER N_SCALAR=-0.74
        signed = signed * (1.0 + _INTENSIFIER_BOOST * boost)
        sums = np.add.reduceat(signed, starts)
        sums = np.where(doc_len > 0, sums, 0.0)
        # exclamation emphasis (up to 4 count, VADER's cap), sign-aligned
        excl_cnt = pc.fill_null(pc.count_substring(text, "!"), 0).cast(
            pa.float64()).to_numpy(zero_copy_only=False)
        n_excl = np.minimum(excl_cnt, 4.0)
        sums = sums + np.sign(sums) * 0.292 * n_excl  # B_EXCL=0.292
        compound = sums / np.sqrt(sums * sums + 15.0)  # VADER α=15
    return _set_column(batch, "sentiment", pa.array(compound, pa.float64()))


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
