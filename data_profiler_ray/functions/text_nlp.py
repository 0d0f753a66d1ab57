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
- ``sentiment_batch``   — M9: the VADER compound (graded lexicon subset in
  vader_lexicon.py + the published rule set: distance-decayed boosters,
  ALLCAPS emphasis, negation window, but-clause, punctuation
  amplification, x/√(x²+α) normalization; reference ``:442-447``);
- ``NerTagger``/``ner_batch`` — M10: gazetteer + shape-rule entity
  extraction with the spaCy-style label space instead of spaCy
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
# Capitalized-run chunker (r5 NER fidelity, VERDICT item 8): a token is a
# Titlecase word (incl. Latin-1 accents: Müller), an ALL-CAPS acronym
# (NASA, IBM), or an initial ("F."); runs may bridge the lowercase
# connectors of real-world names ("University of Oxford", "Bank of
# America", "David van der Berg").
_CAPWORD = r"[A-ZÀ-Þ][a-zß-ÿ]+"
_CAPTOK = rf"(?:{_CAPWORD}|[A-Z]{{2,}}|[A-Z]\.)"
_CONNECT = r"(?:of(?:\s+the)?|de|del|da|van|von|der|al|&)"
_ENTITY_RE = re.compile(
    rf"\b{_CAPTOK}(?:\s+(?:{_CONNECT}\s+)*{_CAPTOK})*")
_NUM_RE = re.compile(
    r"\b\d{1,3}(?:,\d{3})+(?:\.\d+)?\b|\b\d+(?:\.\d+)?\b")
_EMAIL_RE = re.compile(r"\b[\w.+-]+@[\w-]+\.[\w.]+\b")
_URL_RE = re.compile(r"\bhttps?://\S+\b")


def _stem(tok: str) -> str:
    """Real Porter stemmer (memoized; see functions/stemmer.py). The old
    light suffix-stripper is kept as the fallback shape only in history —
    the chain now matches the reference's Snowball-class stemming."""
    from .stemmer import stem_memo
    return stem_memo(tok)


def clean_text_batch(batch: pa.Table, text_col: str = "text",
                     lang: str = "en", mode: str = "stem") -> pa.Table:
    """M7 cleaning chain → adds ``text_clean`` (reference profiler.py:315-365:
    punctuation strip keeping apostrophes, '-'→space, per-language
    stopwords, then per-language stemming or lemmatization).

    ``lang`` selects the stopword list AND the normalizer: Porter for
    English, Snowball German, light stemmers for fr/es/it/pt
    (functions/stemmer_i18n.py — the reference runs NLTK Snowball per
    detected language, text/profiler.py:337-341). ``lang="auto"`` detects
    the language PER DOCUMENT first (the stopword-hit heuristic of
    language_id_batch) and cleans each with its own stopwords + stemmer —
    the reference's detect-then-stem flow (text/profiler.py:283-341).
    ``mode="lemma"`` swaps in the English lemmatizer
    (functions/lemmatizer.py, the simplemma analogue of
    text/profiler.py:343-365); non-English lemma falls back to that
    language's stemmer.
    """
    from .stemmer_i18n import stem_token
    text = batch.column(text_col)
    if lang == "auto":
        from .text import language_id_batch
        doc_langs = language_id_batch(
            pa.table({"text": text}))["lang_pred"].to_pylist()
    else:
        doc_langs = None
    norm = pc.replace_substring_regex(text, r"-", " ")
    # RE2's \w is ASCII-only — use unicode classes so accented letters
    # (häuser, canción) survive the punctuation strip
    norm = pc.replace_substring_regex(norm, r"[^\p{L}\p{N}_\s']", "")
    norm = pc.utf8_lower(norm)

    def _norm_tok(t: str, lg: str) -> str:
        if mode == "lemma" and lg == "en":
            from .lemmatizer import lemmatize
            return lemmatize(t)
        return stem_token(t, lg)

    out = []
    for i, v in enumerate(norm.to_pylist()):
        if v is None:
            out.append(None)
            continue
        lg = doc_langs[i] if doc_langs is not None else lang
        if lg not in _LANG_STOPWORDS:
            lg = "en"
        stop = _LANG_STOPWORDS[lg]
        out.append(" ".join(_norm_tok(t, lg) for t in v.split()
                            if t not in stop))
    from .text import _set_column
    return _set_column(batch, "text_clean", pa.array(out, pa.string()))


_NEGATION_WINDOW = 3         # a negation scales the next 3 tokens
_BOOST_DISTANCE_W = (1.0, 0.95, 0.9)  # published distance decay for boosters
_B_EXCL = 0.292              # per-'!' emphasis, capped at 4
_QM_STEP, _QM_CAP = 0.18, 0.96  # '?' emphasis: n×0.18 for 2-3, else 0.96


def vader_compound(text: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Compound score per document in [-1, 1] — the VADER algorithm
    (Hutto & Gilbert 2014; published rule set + graded lexicon subset in
    ``vader_lexicon.py``; reference consumes NLTK's implementation at
    text/profiler.py:442-447):

    - graded word valences on the −4..+4 scale;
    - degree modifiers (boosters/dampeners) up to 3 tokens back with the
      published distance decay 1.0/0.95/0.9, sign-aligned;
    - ALLCAPS emphasis +0.733·sign when the doc is mixed-case;
    - negation ×−0.74 within a 3-token window;
    - but-clause reweighting (×0.5 before the first 'but', ×1.5 after);
    - '!' (0.292 each, ≤4) and '?' (0.18×n for 2-3, 0.96 beyond)
      amplification, sign-aligned;
    - normalization x/√(x²+15).

    Not implemented from the original (documented gaps): special-case
    idioms ('the bomb', 'kiss of death') and 'least'/'never so' sequence
    rules. Emoticons ARE matched (raw-token lookup before punctuation
    stripping, r4). Fully vectorized: dict lookups via pandas map over
    the flat token array; windows via shifted-index arithmetic masked at
    document boundaries.
    """
    import pandas as pd

    from .vader_lexicon import (ALPHA, B_DECR, BOOSTERS, C_INCR, EMOTICONS,
                                LEXICON, NEGATIONS, N_SCALAR)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    filled = pc.fill_null(text, "")
    toks = pc.split_pattern_regex(filled, r"\s+")  # case-preserving
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    offsets = toks.offsets.to_numpy(zero_copy_only=False)
    n_docs = len(offsets) - 1
    if not len(flat) or n_docs == 0:
        return np.zeros(n_docs)
    n_tok = len(flat)
    doc_len = np.diff(offsets)          # ≥1 always (split of "" is [""])
    starts = offsets[:-1]
    doc_start_of = np.repeat(starts, doc_len)
    pos = np.arange(n_tok)

    # strip clinging punctuation so "good!" / "BAD," match the lexicon;
    # emoticons are matched on the RAW token first (stripping erases them)
    bare = pc.replace_substring_regex(flat, r"^\W+|\W+$", "")
    raw = pd.Series(flat.to_numpy(zero_copy_only=False))
    emo = raw.map(EMOTICONS)
    lower = pd.Series(pc.utf8_lower(bare).to_numpy(zero_copy_only=False))
    val = emo.fillna(lower.map(LEXICON)).fillna(0.0).to_numpy(
        dtype=np.float64)
    boost = lower.map(BOOSTERS).fillna(0.0).to_numpy(dtype=np.float64)
    neg_flag = lower.isin(NEGATIONS).to_numpy().astype(np.float64)
    # a booster position that is itself a lexicon word contributes valence,
    # not a scalar (mirrors the published in-lexicon skip)
    boost = np.where(val != 0.0, 0.0, boost)

    # bigram dampeners "kind of" / "sort of" (published BOOSTER_DICT
    # entries): the first word is NOT a lexical hit ("kind" alone is a
    # graded positive) and the pair acts as ONE dampener anchored at the
    # "of" token, adjacent to the word it modifies (r5; validates against
    # the published compound 0.3832 for "The book was only kind of good.")
    low_np = lower.to_numpy()
    head = np.isin(low_np, ("kind", "sort"))
    if head.any():
        big = np.zeros(n_tok, dtype=bool)
        big[:-1] = (head[:-1] & (low_np[1:] == "of")
                    & (doc_start_of[1:] == doc_start_of[:-1]))
        if big.any():
            at = np.flatnonzero(big)
            val[at] = 0.0
            boost[at] = 0.0
            boost[at + 1] = B_DECR

    # ALLCAPS emphasis: only when the doc mixes cased styles
    is_caps = pc.and_(pc.utf8_is_upper(bare),
                      pc.match_substring_regex(bare, "[A-Za-z]{2}")).cast(
        pa.int8()).to_numpy(zero_copy_only=False).astype(np.float64)
    has_alpha = pc.match_substring_regex(bare, "[A-Za-z]").cast(
        pa.int8()).to_numpy(zero_copy_only=False).astype(np.float64)
    d_caps = np.add.reduceat(is_caps, starts)
    d_alpha = np.add.reduceat(has_alpha, starts)
    cap_diff = (d_caps > 0) & (d_caps < d_alpha)
    cap_tok = is_caps * np.repeat(cap_diff, doc_len)
    sign = np.sign(val)
    val = val + C_INCR * sign * cap_tok

    # distance-decayed booster scalars from up to 3 preceding tokens
    scalar = np.zeros(n_tok)
    for d, w in enumerate(_BOOST_DISTANCE_W, start=1):
        prev = pos - d
        ok = prev >= doc_start_of
        scalar += np.where(ok, w * boost[np.maximum(prev, 0)], 0.0)
    val = val + scalar * sign

    # negation window: any negation in the previous 3 same-doc tokens
    cs = np.concatenate([[0.0], np.cumsum(neg_flag)])
    lo = np.maximum(pos - _NEGATION_WINDOW, doc_start_of)
    negated = (cs[pos] - cs[lo]) > 0
    val = np.where(negated, N_SCALAR * val, val)

    # but-clause: ×0.5 before the first 'but' of the doc, ×1.5 after
    is_but = (lower == "but").to_numpy()
    if is_but.any():
        but_pos = np.where(is_but, pos, n_tok)
        first_but = np.minimum.reduceat(but_pos, starts)
        fb_tok = np.repeat(first_but, doc_len)
        val = np.where(fb_tok < n_tok,
                       np.where(pos < fb_tok, 0.5 * val,
                                np.where(pos > fb_tok, 1.5 * val, val)),
                       val)

    sums = np.add.reduceat(val, starts)
    # punctuation amplification, sign-aligned
    excl = np.minimum(pc.fill_null(pc.count_substring(filled, "!"), 0).cast(
        pa.float64()).to_numpy(zero_copy_only=False), 4.0) * _B_EXCL
    qm = pc.fill_null(pc.count_substring(filled, "?"), 0).cast(
        pa.float64()).to_numpy(zero_copy_only=False)
    qamp = np.where(qm > 3, _QM_CAP, np.where(qm > 1, qm * _QM_STEP, 0.0))
    sums = sums + np.sign(sums) * (excl + qamp)
    return np.clip(sums / np.sqrt(sums * sums + ALPHA), -1.0, 1.0)


def sentiment_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """M9 polarity per document → ``sentiment`` column (VADER compound;
    see :func:`vader_compound`)."""
    from .text import _set_column
    compound = vader_compound(batch.column(text_col))
    return _set_column(batch, "sentiment", pa.array(compound, pa.float64()))


# --------------------------------------------------------------------------
# Gazetteer + shape-rule NER (r2 VERDICT item 7). The reference extracts
# spaCy ``doc.ents`` with their label map (text/profiler.py:449-465); this
# is the dependency-free analogue: broadcast gazetteers + title-case-run
# shape rules in an actor-pool stage, emitting the spaCy-style label space
# PERSON / ORG / GPE / DATE / TIME / MONEY / PERCENT / CARDINAL / EMAIL /
# URL / MISC.

_GPE_GAZETTEER = frozenset("""
france germany spain italy portugal england scotland ireland netherlands
belgium sweden norway denmark finland poland austria switzerland greece
turkey russia ukraine china japan korea india pakistan indonesia vietnam
thailand australia canada mexico brazil argentina chile peru colombia
egypt nigeria kenya morocco ethiopia america
london paris berlin madrid rome lisbon amsterdam brussels stockholm oslo
copenhagen helsinki warsaw vienna zurich geneva athens istanbul moscow
kyiv beijing shanghai tokyo osaka seoul delhi mumbai jakarta hanoi
bangkok sydney melbourne toronto vancouver montreal chicago boston
seattle dallas houston atlanta miami denver phoenix philadelphia
washington cairo lagos nairobi casablanca frankfurt munich hamburg
texas california florida
""".split())

_PERSON_GIVEN = frozenset("""
james john robert michael william david richard joseph thomas charles
mary patricia jennifer linda elizabeth barbara susan jessica sarah karen
alice bob carol daniel emma frank grace henry isabel jack kate liam
maria nathan olivia peter quinn rachel samuel tina victor wendy george
paul mark anna laura sofia lucas hugo felix nina ivan boris dmitri chen
wei yuki hana priya arjun fatima omar ahmed leila
""".split())

_ORG_SUFFIX = frozenset("""
inc corp corporation ltd llc gmbh co company group labs laboratories
university institute college bank systems technologies software
foundation association society agency committee council ministry
department bureau press times journal commission congress parliament
senate fc united club
""".split())

_HONORIFICS = frozenset(
    ["mr", "mrs", "ms", "dr", "prof", "professor", "sir", "president",
     "senator", "judge", "captain", "general", "minister", "chancellor",
     "governor", "mayor", "colonel", "sergeant", "reverend", "rabbi",
     "imam", "lord", "lady", "dame", "king", "queen", "prince",
     "princess"])

# Nationality / group adjectives → spaCy's NORP label (r5)
_NORP_DEMONYMS = frozenset("""
american british english french german spanish italian portuguese dutch
belgian swedish norwegian danish finnish polish austrian swiss greek
turkish russian ukrainian chinese japanese korean indian pakistani
indonesian vietnamese thai australian canadian mexican brazilian
argentine chilean peruvian colombian egyptian nigerian kenyan moroccan
ethiopian irish scottish welsh hungarian czech romanian bulgarian
croatian serbian european asian african
""".split())

# ALL-CAPS acronyms default to ORG (NASA, IBM, WHO) except the handful
# that are places; common non-entity caps are stoplisted
_GPE_ACRONYMS = frozenset(["usa", "us", "uk", "uae", "ussr", "prc"])
_ACRONYM_STOP = frozenset(["OK", "TV", "AM", "PM", "ID", "PS", "VS",
                           "AKA", "ASAP", "FYI", "DIY", "FAQ", "CEO",
                           "CFO", "CTO", "PhD", "USD", "EUR", "GBP"])

_MONTHS = frozenset(
    ["january", "february", "march", "april", "may", "june", "july",
     "august", "september", "october", "november", "december"])
_WEEKDAYS = frozenset(
    ["monday", "tuesday", "wednesday", "thursday", "friday", "saturday",
     "sunday"])

_DATE_RE = re.compile(
    r"\b(?:\d{4}-\d{2}-\d{2}|\d{1,2}/\d{1,2}/\d{2,4}"
    r"|(?:January|February|March|April|May|June|July|August|September"
    r"|October|November|December)"
    r"\s+(?:\d{1,2},\s*\d{4}|\d{4}|\d{1,2})"
    r"|(?:19|20)\d{2})\b")
_TIME_RE = re.compile(r"\b\d{1,2}:\d{2}(?::\d{2})?(?:\s?(?:am|pm|AM|PM))?\b")
_MONEY_RE = re.compile(
    r"[$€£]\s?\d[\d,]*(?:\.\d+)?(?:\s?(?:million|billion|k|m|bn))?"
    r"|\b\d[\d,]*(?:\.\d+)?\s(?:dollars|euros|pounds)\b")
_PERCENT_RE = re.compile(r"\b\d+(?:\.\d+)?\s?%")


class NerTagger:
    """Actor-pool ``map_batches`` callable: gazetteer + shape-rule NER.

    Gazetteers and regexes are built/compiled ONCE per actor in
    ``__init__`` (ST1 pattern — the reference re-creates its spaCy
    pipeline per file, text/profiler.py:283-293). Extraction order gives
    typed patterns (URL/EMAIL/DATE/TIME/MONEY/PERCENT) precedence over
    capitalized-run entities; consumed spans are masked so a date inside
    a run is not double-counted.

    Capitalized-run labeling: ORG if the run ends in / contains a company
    suffix; PERSON if preceded by an honorific or starting with a known
    given name; GPE if any token is a known country/city; MISC otherwise
    (spaCy's residual classes). Sentence-initial single capitalized words
    are treated as sentence case and skipped.
    """

    def __init__(self, text_col: str = "text", max_entities: int = 50,
                 extra_gazetteers: dict | None = None):
        self.text_col = text_col
        self.max_entities = max_entities
        self.gpe = set(_GPE_GAZETTEER)
        self.person = set(_PERSON_GIVEN)
        self.org_suffix = set(_ORG_SUFFIX)
        if extra_gazetteers:
            self.gpe |= {w.lower() for w in extra_gazetteers.get("GPE", [])}
            self.person |= {w.lower()
                            for w in extra_gazetteers.get("PERSON", [])}
            self.org_suffix |= {w.lower()
                                for w in extra_gazetteers.get("ORG", [])}

    def _label_run(self, run: str, prev_word: str,
                   honorific: bool = False) -> str:
        raw = run.split()
        toks = [t.rstrip(".").lower() for t in raw]
        caps = [t for t in raw if len(t) >= 2 and t.isupper()
                and t not in _ACRONYM_STOP]
        if any(t.lower() in _GPE_ACRONYMS for t in caps):
            return "GPE"
        if any(t in self.org_suffix for t in toks):
            return "ORG"
        if honorific or prev_word in _HONORIFICS or toks[0] in self.person:
            return "PERSON"
        if caps:                         # NASA, IBM, WHO, CERN → ORG
            return "ORG"
        if all(t in _NORP_DEMONYMS for t in toks):
            return "NORP"
        if any(t in self.gpe for t in toks):
            return "GPE"
        if all(t in _MONTHS or t in _WEEKDAYS for t in toks):
            return "DATE"
        return "MISC"

    def _doc_entities(self, doc: str) -> list[dict]:
        ents: list[tuple[int, int, str, str]] = []
        taken: list[tuple[int, int]] = []

        def free(a: int, b: int) -> bool:
            return all(b <= s or a >= e for s, e in taken)

        for rx, label in ((_URL_RE, "URL"), (_EMAIL_RE, "EMAIL"),
                          (_DATE_RE, "DATE"), (_TIME_RE, "TIME"),
                          (_MONEY_RE, "MONEY"), (_PERCENT_RE, "PERCENT")):
            for m in rx.finditer(doc):
                if free(m.start(), m.end()):
                    ents.append((m.start(), m.end(), m.group(), label))
                    taken.append((m.start(), m.end()))
        for m in _ENTITY_RE.finditer(doc):
            if not free(m.start(), m.end()):
                continue
            # "Anna Schmidt of Deutsche Bank" is TWO entities; "Bank of
            # America" is one: keep the "of"-bridge only when the word
            # before "of" is an org head-noun, else split the run there
            for g, start in self._split_of(m.group(), m.start()):
                self._emit_run(doc, g, start, ents, taken)
        for m in _NUM_RE.finditer(doc):
            if free(m.start(), m.end()):
                ents.append((m.start(), m.end(), m.group(), "CARDINAL"))
                taken.append((m.start(), m.end()))
        ents.sort()
        return [{"text": t, "label": lb}
                for _, _, t, lb in ents[: self.max_entities]]

    _OF_SPLIT = re.compile(r"\s+of\s+(?:the\s+)?")

    def _split_of(self, g: str, start: int) -> list[tuple[str, int]]:
        m = self._OF_SPLIT.search(g)
        if not m:
            return [(g, start)]
        left = g[:m.start()]
        if left.split()[-1].rstrip(".").lower() in self.org_suffix:
            return [(g, start)]
        return ([(left, start)]
                + self._split_of(g[m.end():], start + m.end()))

    def _emit_run(self, doc: str, g: str, start: int,
                  ents: list, taken: list) -> None:
        # strip leading articles / honorifics out of the span itself
        # ("The University of Oxford" → "University of Oxford",
        #  "Professor Diaz" → PERSON "Diaz"); spaCy's ents exclude the
        # determiner and the title the same way
        honorific = False
        while True:
            parts = g.split(None, 1)
            head = parts[0].rstrip(".").lower()
            if head != "the" and head not in _HONORIFICS:
                break
            honorific = honorific or head in _HONORIFICS
            if len(parts) < 2:
                g = ""
                break
            start += len(g) - len(parts[1])
            g = parts[1]
        if not g:
            return
        before = doc[:start].rstrip()
        sent_initial = (not before) or before[-1] in ".!?"
        prev_words = [w for w in re.split(r"\W+", before.lower()) if w]
        prev_word = prev_words[-1] if prev_words else ""
        raw_first = g.split(None, 1)[0]
        first = raw_first.rstrip(".").lower()
        # sentence-initial capitalization is usually just sentence case:
        # strip the first word UNLESS the run carries a positive signal
        # that includes it (org suffix anywhere, known given name /
        # place / demonym / month as the first token, an acronym, or an
        # honorific before the run)
        keep_first = (honorific or prev_word in _HONORIFICS
                      or first in self.person or first in self.gpe
                      or first in _NORP_DEMONYMS or first in _MONTHS
                      or first in _WEEKDAYS
                      or (len(raw_first) >= 2 and raw_first.isupper()
                          and raw_first not in _ACRONYM_STOP)
                      or self._label_run(g, prev_word, honorific) == "ORG")
        if sent_initial and not keep_first:
            parts = g.split(None, 1)
            if len(parts) < 2:
                return
            start += len(g) - len(parts[1])
            g = parts[1]
        label = self._label_run(g, prev_word, honorific)
        ents.append((start, start + len(g), g, label))
        taken.append((start, start + len(g)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .text import _set_column
        all_ents = [[] if doc is None else self._doc_entities(doc)
                    for doc in batch.column(self.text_col).to_pylist()]
        typ = pa.list_(pa.struct([("text", pa.string()),
                                  ("label", pa.string())]))
        return _set_column(batch, "entities", pa.array(all_ents, typ))


def ner_batch(batch: pa.Table, text_col: str = "text",
              max_entities: int = 50) -> pa.Table:
    """M10 entity extraction → ``entities`` list<struct<text,label>>
    (functional wrapper around :class:`NerTagger` for one-off batches;
    pipelines should pass the class to ``map_batches`` directly)."""
    return NerTagger(text_col=text_col, max_entities=max_entities)(batch)


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
