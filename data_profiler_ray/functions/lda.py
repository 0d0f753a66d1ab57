"""Latent Dirichlet Allocation — distributed batch variational Bayes.

A REAL topic model for M11 (the reference fits sklearn's
LatentDirichletAllocation over a CountVectorizer matrix,
``/root/reference/stelardataprofiler/text/profiler.py:425-465``; sklearn
is absent here, so this implements the same variational-Bayes E/M scheme
from the public literature — Blei, Ng & Jordan 2003; Hoffman, Blei & Bach
2010 — in numpy over a hashed vocabulary).

Distributed shape (Ray-Data-first):

- vocabulary = token hash mod ``vocab_size`` (no global dictionary build,
  no shuffle; a bounded driver-side sample maps buckets back to example
  tokens for display);
- each pass broadcasts the topic-word variational parameter λ (K×V) via
  ``ray.put`` and runs the per-document E-step inside ``map_batches``
  (documents are independent given λ — embarrassingly parallel); each
  batch returns ONE (K×V) sufficient-statistics row;
- the M-step is a tiny driver-side reduction: λ = η + Σ sstats. Batch VB
  (not online VB with a learning rate) keeps the result independent of
  batch order/partitioning — the property every distributed test needs.

The per-document E-step iterates γ updates on (K × n_unique_terms)
arrays — inherently per-document (model inference, not a row transform);
everything inside is vectorized numpy.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .text import _LANG_STOPWORDS, _token_lists, hash_string_array


def _doc_term_counts(batch: pa.Table, text_col: str, vocab_size: int,
                     stop_hashes: np.ndarray):
    """Batch → per-doc (bucket ids, counts) using hashed vocabulary."""
    flat, offsets = _token_lists(batch.column(text_col))
    h = hash_string_array(flat)
    keep = ~np.isin(h, stop_hashes)
    buckets = (h % np.uint64(vocab_size)).astype(np.int64)
    doc_of = np.repeat(np.arange(len(offsets) - 1), np.diff(offsets))
    buckets, doc_of = buckets[keep], doc_of[keep]
    order = np.lexsort((buckets, doc_of))
    d_s, b_s = doc_of[order], buckets[order]
    uniq = np.r_[True, (d_s[1:] != d_s[:-1]) | (b_s[1:] != b_s[:-1])] \
        if d_s.size else np.zeros(0, bool)
    starts = np.flatnonzero(uniq)
    cnts = np.diff(np.append(starts, d_s.size))
    return d_s[starts], b_s[starts], cnts, len(offsets) - 1


def _digamma(x: np.ndarray) -> np.ndarray:
    """Vectorized digamma (Bernardo 1976 recurrence + asymptotic series) —
    scipy-free, accurate to ~1e-10 for x > 0."""
    x = np.asarray(x, dtype=np.float64)
    out = np.zeros_like(x)
    xx = x.copy()
    # recurrence to push arguments above 6
    for _ in range(6):
        small = xx < 6.0
        if not small.any():
            break
        out[small] -= 1.0 / xx[small]
        xx[small] += 1.0
    inv = 1.0 / xx
    inv2 = inv * inv
    out += (np.log(xx) - 0.5 * inv
            - inv2 * (1.0 / 12 - inv2 * (1.0 / 120 - inv2 / 252)))
    return out


class _EStep:
    """map_batches actor: one pass of per-doc variational inference against
    the broadcast λ; emits a single serialized (K×V) sstats row."""

    def __init__(self, lam_ref, text_col: str, vocab_size: int,
                 alpha: float, stop_hashes_ref):
        self.lam = ray.get(lam_ref) if isinstance(lam_ref, ray.ObjectRef) \
            else lam_ref
        self.text_col = text_col
        self.vocab_size = vocab_size
        self.alpha = alpha
        self.stop_hashes = ray.get(stop_hashes_ref) \
            if isinstance(stop_hashes_ref, ray.ObjectRef) else stop_hashes_ref
        # expectation of log beta under q(beta | lambda)
        self.e_log_beta = (_digamma(self.lam)
                           - _digamma(self.lam.sum(axis=1))[:, None])

    def __call__(self, batch: pa.Table) -> pa.Table:
        d, b, c, n_docs = _doc_term_counts(batch, self.text_col,
                                           self.vocab_size, self.stop_hashes)
        K = self.lam.shape[0]
        sstats = np.zeros_like(self.lam)
        if d.size:
            starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
            ends = np.append(starts[1:], d.size)
            for s, e in zip(starts, ends):
                ids = b[s:e]
                cts = c[s:e].astype(np.float64)
                expElogbeta_d = np.exp(self.e_log_beta[:, ids])  # (K, n)
                gamma = np.full(K, self.alpha + cts.sum() / K)
                expElogtheta = np.exp(_digamma(gamma)
                                      - _digamma(gamma.sum()))
                for _ in range(40):
                    phinorm = expElogtheta @ expElogbeta_d + 1e-100
                    new_gamma = self.alpha + expElogtheta * (
                        expElogbeta_d @ (cts / phinorm))
                    expElogtheta = np.exp(_digamma(new_gamma)
                                          - _digamma(new_gamma.sum()))
                    if np.abs(new_gamma - gamma).mean() < 1e-3:
                        gamma = new_gamma
                        break
                    gamma = new_gamma
                phinorm = expElogtheta @ expElogbeta_d + 1e-100
                sstats[:, ids] += np.outer(expElogtheta, cts / phinorm) \
                    * np.exp(self.e_log_beta[:, ids])
        payload = sstats.astype(np.float64).tobytes()
        return pa.table({
            "n_docs": pa.array([n_docs], pa.int64()),
            "sstats": pa.array([payload], pa.large_binary()),
        })


def lda_fit(ds: "ray.data.Dataset", text_col: str = "text",
            n_topics: int = 10, vocab_size: int = 1 << 14,
            n_passes: int = 5, alpha: float = 0.1, eta: float = 0.01,
            seed: int = 2023, lang: str = "en",
            concurrency=None) -> dict:
    """Fit LDA over a document Dataset; returns {"lambda": (K,V) array,
    "n_docs": int, "vocab_size": V}."""
    rng = np.random.default_rng(seed)
    lam = rng.gamma(100.0, 1.0 / 100.0, (n_topics, vocab_size))
    stop = sorted(_LANG_STOPWORDS.get(lang, _LANG_STOPWORDS["en"]))
    stop_hashes = hash_string_array(pa.array(stop, pa.string()))
    stop_ref = ray.put(stop_hashes)
    total_docs = 0
    for _ in range(n_passes):
        lam_ref = ray.put(lam)
        parts = ds.select_columns([text_col]).map_batches(
            _EStep, fn_constructor_args=(lam_ref, text_col, vocab_size,
                                         alpha, stop_ref),
            batch_format="pyarrow", concurrency=concurrency or (1, 8))
        sstats = np.zeros_like(lam)
        total_docs = 0
        for t in parts.iter_batches(batch_format="pyarrow"):
            for nd, blob in zip(t.column("n_docs").to_pylist(),
                                t.column("sstats").to_pylist()):
                total_docs += nd
                sstats += np.frombuffer(blob, dtype=np.float64).reshape(
                    lam.shape)
        lam = eta + sstats  # batch-VB M-step: order/partition independent
    return {"lambda": lam, "n_docs": total_docs, "vocab_size": vocab_size,
            "n_topics": n_topics}


def lda_top_buckets(model: dict, top_n: int = 10) -> np.ndarray:
    """(K, top_n) highest-weight vocabulary buckets per topic."""
    lam = model["lambda"]
    return np.argsort(-lam, axis=1)[:, :top_n]


def bucket_examples(ds: "ray.data.Dataset", text_col: str = "text",
                    vocab_size: int = 1 << 14,
                    sample_rows: int = 10_000) -> dict[int, str]:
    """Bounded bucket→example-token map for displaying topics (driver-side
    sample; display-only — never part of the fit)."""
    head = pa.concat_tables(list(
        ds.select_columns([text_col]).limit(sample_rows)
        .iter_batches(batch_format="pyarrow")))
    flat, _ = _token_lists(head.column(text_col))
    h = hash_string_array(flat)
    buckets = (h % np.uint64(vocab_size)).astype(np.int64)
    out: dict[int, str] = {}
    for tok, bkt in zip(flat.to_pylist(), buckets):
        if bkt not in out and tok:
            out[int(bkt)] = tok
    return out
