"""Deduplication operators for training-data pipelines.

Five near/exact-dup families, each Ray-Data-first (the reference has no
near-dedup at all — SURVEY.md §2.7 — its only dedup is the silent
datetime-index drop at ``/root/reference/stelardataprofiler/
tabular_timeseries/variables/utils.py:105-107``):

- **exact**: hash-partition on a key (or text hash) → per-group keep-first;
- **MinHash + LSH**: token-shingle sets → vectorized 64-perm minhash →
  band/bucket groupby → candidate pairs → exact-Jaccard verification;
- **SimHash**: 64-bit token-weight signature, banded into 16-bit tables,
  hamming-distance candidates;
- **n-gram Jaccard**: exact Jaccard on LSH candidates (verification path);
- **embedding cosine**: random-hyperplane LSH buckets → within-bucket
  pairwise cosine (brute-force inside buckets only).

Scale shape: every stage is a ``map_batches`` over Arrow; bucket
co-location is a sort + vectorized segment scan (the exchange carries only
(bucket, id, small-state) rows, never raw text — and with ~1 bucket per doc
per band, per-group ``map_groups`` overhead would dominate, measured 2.4×
slower). Candidate pairs are verified against a filtered re-read of just
the involved docs; union-find for final cluster survivors runs on the
driver over the PAIRS (size ~ number of duplicates, not corpus size).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .text import hash_string_array


def _token_hashes(text: pa.Array):
    """Lowercased whitespace tokens → stable 64-bit hashes (flat, offsets).

    Hashing runs over the flat token array's UTF-8 byte buffer
    (``hash_string_array``) — no per-token Python objects in this hottest
    dedup path (round-1 anti-pattern #3)."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern_regex(pc.utf8_lower(text), r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return hash_string_array(flat), offsets


def _shingles_vectorized(tok_h: np.ndarray, offsets: np.ndarray, k: int = 3):
    """Batch-vectorized shingling: one pass over the flat token-hash array,
    masking out windows that cross doc boundaries. Returns (hashes, doc_offsets)."""
    lens = np.diff(offsets)
    n_tok = tok_h.size
    if n_tok == 0:
        return (np.zeros(0, np.uint64),
                np.zeros(len(lens) + 1, np.int64))
    mults = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                      0x165667B19E3779F9, 0x27D4EB2F165667C5,
                      0x85EBCA77C2B2AE63][:k], dtype=np.uint64)
    doc_of = np.repeat(np.arange(len(lens)), lens)
    with np.errstate(over="ignore"):
        acc = tok_h * mults[0]
        for j in range(1, k):
            shifted = np.zeros_like(tok_h)
            shifted[: n_tok - j] = tok_h[j:] * mults[j]
            # zero contributions that cross a document boundary: without
            # this, the single whole-doc window kept for docs shorter than
            # k would XOR in the NEXT doc's leading tokens, making short-doc
            # shingles depend on batch neighbors (nondeterministic dedup)
            same_doc = np.zeros(n_tok, dtype=bool)
            same_doc[: n_tok - j] = doc_of[j:] == doc_of[: n_tok - j]
            shifted[~same_doc] = 0
            acc = acc ^ shifted
    # window starting at i is valid if i+k-1 is in the same doc
    start_doc = doc_of
    end_idx = np.minimum(np.arange(n_tok) + k - 1, n_tok - 1)
    valid = (doc_of[end_idx] == start_doc) & (np.arange(n_tok) + k - 1 < n_tok)
    # short docs (len<k): keep their single window at doc start (whole doc)
    short = lens < k
    if short.any():
        first_idx = offsets[:-1][short & (lens > 0)]
        valid[first_idx] = True
    sh = acc[valid]
    doc_sh = doc_of[valid]
    counts = np.bincount(doc_sh, minlength=len(lens))
    out_off = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    return sh, out_off


class MinHasher:
    """map_batches actor: text → (id, band, band_hash) rows.

    Permutation parameters are built once per actor in ``__init__``
    (stateful-stage pattern, SURVEY.md §7.2). num_perm minhash values per
    doc, banded into ``bands`` buckets of ``rows_per_band`` for LSH: two
    docs share a bucket iff one band of their signatures agrees exactly —
    P(candidate) ≈ 1−(1−j^r)^b for Jaccard j.
    """

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 num_perm: int = 64, bands: int = 16, shingle_k: int = 3,
                 seed: int = 2023):
        rng = np.random.default_rng(seed)
        self.a = (rng.integers(1, (1 << 61) - 1, size=num_perm,
                               dtype=np.int64).astype(np.uint64) | np.uint64(1))
        self.b = rng.integers(0, (1 << 61) - 1, size=num_perm,
                              dtype=np.int64).astype(np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.id_col = id_col
        self.text_col = text_col
        self.k = shingle_k

    def signatures(self, batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        tok_h, offsets = _token_hashes(batch.column(self.text_col))
        sh, out_off = _shingles_vectorized(tok_h, offsets, self.k)
        n_docs = len(out_off) - 1
        sig = np.full((n_docs, self.num_perm), np.iinfo(np.uint64).max,
                      dtype=np.uint64)
        if sh.size:
            nonempty = np.diff(out_off) > 0
            starts = np.clip(out_off[:-1], 0, sh.size - 1)
            with np.errstate(over="ignore"):
                for j in range(self.num_perm):
                    pj = (sh * self.a[j] + self.b[j])
                    mins = np.minimum.reduceat(pj, starts)
                    sig[nonempty, j] = mins[nonempty]
        return sig, np.diff(out_off)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sig, _ = self.signatures(batch)
        n_docs = sig.shape[0]
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        r = self.rows_per_band
        band_ids = np.repeat(np.arange(self.bands, dtype=np.int32), n_docs)
        doc_rep = np.tile(ids, self.bands)
        # band bucket = FNV-1a combine of the band's r signature words +
        # splitmix finalizer — r vector ops per band. (Replaced
        # pd.util.hash_array, which routed the structured view through a
        # CATEGORICAL factorize — measured 52 % of the whole UDF. Equal
        # bands still hash equal by construction; a cross-band collision
        # only creates a spurious candidate, which verify_jaccard drops.)
        hashes = np.empty(self.bands * n_docs, dtype=np.int64)
        fnv = np.uint64(0x100000001B3)
        with np.errstate(over="ignore"):
            for bidx in range(self.bands):
                block = sig[:, bidx * r:(bidx + 1) * r]
                h = np.full(n_docs, 1469598103934665603, dtype=np.uint64)
                for c in range(r):
                    h = (h ^ block[:, c]) * fnv
                h ^= h >> np.uint64(33)
                h *= np.uint64(0xFF51AFD7ED558CCD)
                h ^= h >> np.uint64(33)
                h *= np.uint64(0xC4CEB9FE1A85EC53)
                h ^= h >> np.uint64(33)
                hashes[bidx * n_docs:(bidx + 1) * n_docs] = h.view(np.int64)
        return pa.table({
            "band": pa.array(band_ids, pa.int32()),
            "bucket": pa.array(hashes, pa.int64()),
            "id": pa.array(doc_rep, pa.int64()),
        })


def _segment_pairs(tbl: pa.Table, skip_first_last: bool,
                   max_bucket: int = 64) -> tuple[pa.Table, pa.Table]:
    """Vectorized pair extraction over a (band, bucket)-sorted table.

    Returns (pairs, boundary_rows): candidate pairs from interior segments,
    plus the raw rows of the first/last segment (a bucket possibly cut at
    the block edge) for an exact driver-side pass.
    """
    n = tbl.num_rows
    empty_pairs = pa.table({"id_a": pa.array([], pa.int64()),
                            "id_b": pa.array([], pa.int64())})
    if n == 0:
        return empty_pairs, tbl
    band = tbl.column("band").to_numpy(zero_copy_only=False)
    bucket = tbl.column("bucket").to_numpy(zero_copy_only=False)
    ids = tbl.column("id").to_numpy(zero_copy_only=False)
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = (band[1:] != band[:-1]) | (bucket[1:] != bucket[:-1])
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], n)
    lens = ends - starts
    g_count = starts.size
    boundary = np.zeros(g_count, dtype=bool)
    if skip_first_last:
        boundary[0] = boundary[g_count - 1] = True
    a_parts, b_parts = [], []
    # only multi-member interior segments need pairing (rare: real dups)
    for g in np.flatnonzero((lens >= 2) & ~boundary):
        seg = np.unique(ids[starts[g]:ends[g]])
        if seg.size < 2:
            continue
        if seg.size > max_bucket:   # degenerate bucket: star, not clique
            a_parts.append(np.full(seg.size - 1, seg[0]))
            b_parts.append(seg[1:])
        else:
            iu = np.triu_indices(seg.size, k=1)
            a_parts.append(seg[iu[0]])
            b_parts.append(seg[iu[1]])
    pairs = (pa.table({"id_a": pa.array(np.concatenate(a_parts), pa.int64()),
                       "id_b": pa.array(np.concatenate(b_parts), pa.int64())})
             if a_parts else empty_pairs)
    if skip_first_last:
        bnd_idx = np.concatenate([np.arange(starts[0], ends[0]),
                                  np.arange(starts[g_count - 1],
                                            ends[g_count - 1])]) \
            if g_count > 1 else np.arange(starts[0], ends[0])
        boundary_rows = tbl.take(pa.array(np.unique(bnd_idx)))
    else:
        boundary_rows = tbl.slice(0, 0)
    return pairs, boundary_rows


def minhash_candidates(ds: "ray.data.Dataset", id_col: str = "doc_id",
                       text_col: str = "text", num_perm: int = 64,
                       bands: int = 16, shingle_k: int = 3,
                       concurrency=None) -> "ray.data.Dataset":
    """text → LSH candidate duplicate pairs.

    Bucket grouping is a SORT + vectorized segment scan, not
    ``groupby().map_groups`` — with ~1 bucket per doc per band the
    per-group Python overhead of map_groups dominates (measured 28 s for
    1.6M buckets at 100k docs; the segment scan touches only multi-member
    buckets). Buckets cut at block edges are re-paired exactly from the
    o(#blocks) boundary rows.
    """
    banded = ds.select_columns([id_col, text_col]).map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(id_col=id_col, text_col=text_col,
                                   num_perm=num_perm, bands=bands,
                                   shingle_k=shingle_k),
        batch_format="pyarrow", concurrency=concurrency or (1, 8)
    ).materialize()
    # size the sort to the data: tiny corpora would otherwise pay a fixed
    # multi-second exchange over near-empty partitions; large inputs derive
    # width from bytes/128MB via shuffle_width (r2 item 3 — no fixed cap)
    from ..stages.segments import shuffle_width
    nblocks = max(2, min(shuffle_width(banded),
                         max(2, banded.count() // 100_000)))
    srt = banded.repartition(nblocks).sort(["band", "bucket"])

    def block_pairs(batch: pa.Table) -> pa.Table:
        pairs, bnd = _segment_pairs(batch.combine_chunks(),
                                    skip_first_last=True)
        # boundary rows ride along tagged with id_b = -1 - row marker
        if bnd.num_rows:
            marker = pa.table({
                "id_a": pa.array(np.full(bnd.num_rows, -1), pa.int64()),
                "id_b": bnd.column("id").cast(pa.int64()),
                "band": bnd.column("band").cast(pa.int64()),
                "bucket": bnd.column("bucket").cast(pa.int64()),
            })
            pairs = pairs.append_column(
                "band", pa.nulls(pairs.num_rows, pa.int64()))
            pairs = pairs.append_column(
                "bucket", pa.nulls(pairs.num_rows, pa.int64()))
            return pa.concat_tables([pairs, marker])
        pairs = pairs.append_column("band", pa.nulls(pairs.num_rows, pa.int64()))
        pairs = pairs.append_column("bucket", pa.nulls(pairs.num_rows, pa.int64()))
        return pairs

    out = srt.map_batches(block_pairs, batch_format="pyarrow",
                          batch_size=None).materialize()
    # exact re-pairing of boundary buckets on the driver (o(#blocks) rows)
    rows = pa.concat_tables(
        list(out.iter_batches(batch_format="pyarrow")) or
        [pa.table({"id_a": pa.array([], pa.int64()),
                   "id_b": pa.array([], pa.int64()),
                   "band": pa.array([], pa.int64()),
                   "bucket": pa.array([], pa.int64())})])
    is_marker = pc.equal(rows.column("id_a"), -1)
    pairs_tbl = rows.filter(pc.invert(is_marker)).select(["id_a", "id_b"])
    markers = rows.filter(is_marker)
    if markers.num_rows:
        btbl = pa.table({
            "band": markers.column("band"),
            "bucket": markers.column("bucket"),
            "id": markers.column("id_b"),
        })
        order = pc.sort_indices(btbl, sort_keys=[("band", "ascending"),
                                                 ("bucket", "ascending")])
        bpairs, _ = _segment_pairs(btbl.take(order), skip_first_last=False)
        pairs_tbl = pa.concat_tables([pairs_tbl, bpairs])
    return ray.data.from_arrow(pairs_tbl)


_SLOT_SCHEMA = pa.schema([
    ("pair", pa.int64()),
    ("side", pa.int8()),
    ("size", pa.int64()),
    ("shingles", pa.large_list(pa.uint64())),
])


def _unique_shingle_lists(sub: pa.Table, id_col: str, text_col: str,
                          shingle_k: int) -> tuple[np.ndarray, pa.Array]:
    """(ids, large_list<uint64> of each doc's SORTED UNIQUE shingles)."""
    tok_h, offsets = _token_hashes(sub.column(text_col))
    sh, out_off = _shingles_vectorized(tok_h, offsets, shingle_k)
    n_docs = len(out_off) - 1
    doc_rep = np.repeat(np.arange(n_docs), np.diff(out_off))
    order = np.lexsort((sh, doc_rep))
    d_s, s_s = doc_rep[order], sh[order]
    keep = np.r_[True, (d_s[1:] != d_s[:-1]) | (s_s[1:] != s_s[:-1])] \
        if d_s.size else np.zeros(0, dtype=bool)
    d_u, s_u = d_s[keep], s_s[keep]
    counts = np.bincount(d_u, minlength=n_docs)
    new_off = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    lists = pa.LargeListArray.from_arrays(pa.array(new_off, pa.int64()),
                                          pa.array(s_u, pa.uint64()))
    ids = sub.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
    return ids, lists


class _ShingleSlotEmitter:
    """map_batches actor: for each candidate doc in the batch, build its
    unique shingle set ONCE and replicate it to every (pair, side) slot it
    participates in. The doc→pair membership map is broadcast via ray.put
    (O(#pairs)); the corpus streams through exactly once."""

    def __init__(self, memb_ref, wanted_ref, id_col: str, text_col: str,
                 shingle_k: int):
        self.memb_doc, self.memb_pair, self.memb_side = ray.get(memb_ref)
        self.wanted = ray.get(wanted_ref)
        self.id_col = id_col
        self.text_col = text_col
        self.k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        sub = batch.filter(pc.is_in(batch.column(self.id_col),
                                    value_set=self.wanted))
        if sub.num_rows == 0:
            return _SLOT_SCHEMA.empty_table()
        ids, lists = _unique_shingle_lists(sub, self.id_col, self.text_col,
                                           self.k)
        lo = np.searchsorted(self.memb_doc, ids, "left")
        hi = np.searchsorted(self.memb_doc, ids, "right")
        reps = hi - lo
        total = int(reps.sum())
        take_rows = np.repeat(np.arange(ids.size), reps)
        slot_idx = (np.repeat(lo, reps)
                    + np.arange(total) - np.repeat(np.cumsum(reps) - reps,
                                                   reps))
        sizes = np.diff(lists.offsets.to_numpy(zero_copy_only=False))
        return pa.table({
            "pair": pa.array(self.memb_pair[slot_idx], pa.int64()),
            "side": pa.array(self.memb_side[slot_idx], pa.int8()),
            "size": pa.array(sizes[take_rows], pa.int64()),
            "shingles": lists.take(pa.array(take_rows)),
        }, schema=_SLOT_SCHEMA)


_SCORE_SCHEMA = pa.schema([
    ("pair", pa.int64()),
    ("side", pa.int8()),
    ("jaccard", pa.float64()),
    ("size", pa.int64()),
    ("shingles", pa.large_list(pa.uint64())),
])


def _score_pairs_block(batch: pa.Table) -> pa.Table:
    """Vectorized Jaccard over a pair-sorted block of shingle-slot rows.

    A pair with unique corpus ids has exactly 2 slot rows globally (sides
    0 and 1), so any opposite-sided 2-row segment is complete and final;
    other segments (pair cut at a block edge, a doc missing from the
    corpus, or a doc_id duplicated on multiple corpus rows, which yields
    >1 row per side) are re-emitted raw for the driver's exact leftover
    pass (o(#blocks) rows)."""
    b = batch.combine_chunks()
    n = b.num_rows
    if n == 0:
        return _SCORE_SCHEMA.empty_table()
    pairv = b.column("pair").to_numpy(zero_copy_only=False)
    sidev = b.column("side").to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(np.r_[True, pairv[1:] != pairv[:-1]])
    ends = np.append(starts[1:], n)
    lens = ends - starts
    comp = np.flatnonzero(lens == 2)
    if comp.size:  # complete = the 2 rows are opposite sides of the pair
        comp = comp[sidev[starts[comp]] != sidev[starts[comp] + 1]]
    shing = b.column("shingles")
    if isinstance(shing, pa.ChunkedArray):
        shing = shing.combine_chunks()
    vals = shing.values.to_numpy(zero_copy_only=False).astype(np.uint64)
    offs = shing.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    sizes = b.column("size").to_numpy(zero_copy_only=False)
    out: list[pa.Table] = []
    if comp.size:
        rows_a = starts[comp]
        sel = np.empty(comp.size * 2, dtype=np.int64)
        sel[0::2] = rows_a
        sel[1::2] = rows_a + 1
        tok_counts = (offs[sel + 1] - offs[sel])
        total = int(tok_counts.sum())
        inter_full = np.zeros(comp.size, dtype=np.int64)
        if total:
            base = np.repeat(offs[sel], tok_counts)
            within = (np.arange(total)
                      - np.repeat(np.cumsum(tok_counts) - tok_counts,
                                  tok_counts))
            toks = vals[base + within]
            prep = np.repeat(pairv[sel], tok_counts)
            order = np.lexsort((toks, prep))
            p_s, t_s = prep[order], toks[order]
            eq = np.r_[False, (p_s[1:] == p_s[:-1]) & (t_s[1:] == t_s[:-1])]
            seg = np.flatnonzero(np.r_[True, p_s[1:] != p_s[:-1]])
            inter_seg = np.add.reduceat(eq, seg) if seg.size else \
                np.zeros(0, np.int64)
            # map token-bearing pairs back onto the complete-pair axis
            cp = pairv[rows_a]
            pos = np.searchsorted(cp, p_s[seg])
            inter_full[pos] = inter_seg
        union = sizes[rows_a] + sizes[rows_a + 1] - inter_full
        jac = np.where(union > 0, inter_full / np.maximum(union, 1), 1.0)
        out.append(pa.table({
            "pair": pa.array(pairv[rows_a], pa.int64()),
            "side": pa.nulls(comp.size, pa.int8()),
            "jaccard": pa.array(jac, pa.float64()),
            "size": pa.nulls(comp.size, pa.int64()),
            "shingles": pa.nulls(comp.size, pa.large_list(pa.uint64())),
        }, schema=_SCORE_SCHEMA))
    inc_mask = np.ones(starts.size, dtype=bool)
    inc_mask[comp] = False
    inc = np.flatnonzero(inc_mask)
    if inc.size:
        rows = np.concatenate([np.arange(starts[g], ends[g]) for g in inc])
        sub = b.take(pa.array(rows))
        out.append(pa.table({
            "pair": sub.column("pair"),
            "side": sub.column("side"),
            "jaccard": pa.nulls(sub.num_rows, pa.float64()),
            "size": sub.column("size"),
            "shingles": sub.column("shingles"),
        }, schema=_SCORE_SCHEMA))
    return (pa.concat_tables(out) if out else _SCORE_SCHEMA.empty_table())


def verify_jaccard(ds: "ray.data.Dataset", pairs: pa.Table,
                   id_col: str = "doc_id", text_col: str = "text",
                   shingle_k: int = 3, threshold: float = 0.7,
                   concurrency=None,
                   driver_doc_limit: int = 20_000) -> pa.Table:
    """Exact n-gram Jaccard for candidate pairs, scored in WORKERS.

    Shape: dedupe pairs (driver, O(#pairs)) → broadcast the doc→pair-slot
    membership map → ONE corpus pass builds each candidate doc's unique
    shingle set and replicates it to its (pair, side) slots → sort by pair
    → vectorized per-block segment scan computes |A∩B| / |A∪B|. Driver
    state is O(#pairs) (+ o(#blocks) boundary leftovers); shingle sets
    never accumulate on the driver (round-1 scale-killer #5).

    Small candidate sets (≤ ``driver_doc_limit`` distinct docs) skip the
    pair-slot shuffle: its sort costs a fixed few seconds that dwarfs tiny
    corpora, while scoring that many shingle sets on the driver is
    bounded-memory by construction.
    """
    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
    if pairs.num_rows == 0:
        return empty
    # candidates may repeat across LSH bands; dedupe driver-side (O(#pairs))
    pdf = pairs.to_pandas().drop_duplicates(["id_a", "id_b"])
    a = pdf["id_a"].to_numpy(np.int64)
    bb = pdf["id_b"].to_numpy(np.int64)
    pair_doc = np.concatenate([a, bb])
    wanted = np.unique(pair_doc)
    if wanted.size <= driver_doc_limit:
        return _verify_jaccard_driver(ds, a, bb, wanted, id_col, text_col,
                                      shingle_k, threshold)
    pair_idx = np.tile(np.arange(a.size, dtype=np.int64), 2)
    pair_side = np.repeat(np.array([0, 1], dtype=np.int8), a.size)
    order = np.argsort(pair_doc, kind="stable")
    memb_ref = ray.put((pair_doc[order], pair_idx[order], pair_side[order]))
    wanted_ref = ray.put(pa.array(wanted, pa.int64()))

    slots = ds.select_columns([id_col, text_col]).map_batches(
        _ShingleSlotEmitter,
        fn_constructor_args=(memb_ref, wanted_ref, id_col, text_col,
                             shingle_k),
        batch_format="pyarrow", concurrency=concurrency or (1, 8))
    cpus = int(ray.cluster_resources().get("CPU", 8))
    scored = slots.repartition(min(max(cpus, 4), 16)).sort("pair") \
        .map_batches(_score_pairs_block, batch_format="pyarrow",
                     batch_size=None)

    jac_by_pair = np.zeros(a.size, dtype=np.float64)
    seen = np.zeros(a.size, dtype=bool)
    # leftovers keyed per (pair, SIDE): a doc_id duplicated on multiple
    # corpus rows emits >1 slot row per side — last row per side wins
    # (mirrors the driver path's dict semantics), never two copies of the
    # same doc masquerading as both sides (jaccard 1.0 for a non-dup pair)
    leftovers: dict[int, dict[int, frozenset]] = {}
    for t in scored.iter_batches(batch_format="pyarrow"):
        done = t.filter(pc.is_valid(t.column("jaccard")))
        p = done.column("pair").to_numpy(zero_copy_only=False)
        jac_by_pair[p] = done.column("jaccard").to_numpy(
            zero_copy_only=False)
        seen[p] = True
        rest = t.filter(pc.is_null(t.column("jaccard")))
        for pidx, side, sl in zip(rest.column("pair").to_pylist(),
                                  rest.column("side").to_pylist(),
                                  rest.column("shingles").to_pylist()):
            leftovers.setdefault(pidx, {})[side] = frozenset(sl)
    for pidx, by_side in leftovers.items():
        sa = by_side.get(0, frozenset())
        sb = by_side.get(1, frozenset())
        union = len(sa | sb)
        jac_by_pair[pidx] = (len(sa & sb) / union) if union else 1.0
        seen[pidx] = True
    # pairs never seen (doc absent from corpus entirely): jaccard 0
    out = pa.table({"id_a": pa.array(a, pa.int64()),
                    "id_b": pa.array(bb, pa.int64()),
                    "jaccard": pa.array(jac_by_pair, pa.float64())})
    return out.filter(pc.greater_equal(out.column("jaccard"), threshold))


def _verify_jaccard_driver(ds: "ray.data.Dataset", a: np.ndarray,
                           bb: np.ndarray, wanted: np.ndarray, id_col: str,
                           text_col: str, shingle_k: int,
                           threshold: float) -> pa.Table:
    """Small-candidate-set path: shingle sets for the ≤driver_doc_limit
    involved docs are extracted distributed (one filtered pass) but SCORED
    on the driver — no sort exchange; memory bounded by the limit."""
    wanted_set = pa.array(wanted, pa.int64())

    def extract(batch: pa.Table) -> pa.Table:
        sub = batch.filter(pc.is_in(batch.column(id_col),
                                    value_set=wanted_set))
        if sub.num_rows == 0:
            return pa.table({"id": pa.array([], pa.int64()),
                             "shingles": pa.array(
                                 [], pa.large_list(pa.uint64()))})
        ids, lists = _unique_shingle_lists(sub, id_col, text_col, shingle_k)
        return pa.table({"id": pa.array(ids, pa.int64()), "shingles": lists})

    sets: dict[int, frozenset] = {}
    for b in ds.select_columns([id_col, text_col]).map_batches(
            extract, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for i, sl in zip(b.column("id").to_pylist(),
                         b.column("shingles").to_pylist()):
            sets[i] = frozenset(sl)
    jac = np.empty(a.size, dtype=np.float64)
    for k, (ia, ib) in enumerate(zip(a, bb)):
        sa = sets.get(int(ia), frozenset())
        sb = sets.get(int(ib), frozenset())
        union = len(sa | sb)
        jac[k] = (len(sa & sb) / union) if union else 1.0
    out = pa.table({"id_a": pa.array(a, pa.int64()),
                    "id_b": pa.array(bb, pa.int64()),
                    "jaccard": pa.array(jac, pa.float64())})
    return out.filter(pc.greater_equal(out.column("jaccard"), threshold))


def drop_ids_from_pairs(dup_pairs: pa.Table) -> np.ndarray:
    """Union-find over duplicate pairs → ids to DROP (all but the min id of
    each cluster). Driver state is O(#duplicates), never O(corpus)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(dup_pairs.column("id_a").to_pylist(),
                    dup_pairs.column("id_b").to_pylist()):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return np.array(sorted(x for x in parent if find(x) != x),
                    dtype=np.int64)


def survivors_from_pairs(all_ids: np.ndarray, dup_pairs: pa.Table) -> np.ndarray:
    """Union-find over duplicate pairs → keep the min id per cluster.

    Small-data convenience (takes the full id array); the streaming path is
    ``drop_ids_from_pairs`` + a distributed anti-filter (``minhash_dedup``).
    """
    drop = set(drop_ids_from_pairs(dup_pairs).tolist())
    return np.array(sorted(set(all_ids.tolist()) - drop), dtype=np.int64)


class _DropFilter:
    """map_batches callable: anti-filter a broadcast drop-id set."""

    def __init__(self, drop_ref, id_col: str):
        self.drop = ray.get(drop_ref) if isinstance(drop_ref, ray.ObjectRef) \
            else drop_ref
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(self.drop) == 0:
            return batch
        return batch.filter(pc.invert(pc.is_in(batch.column(self.id_col),
                                               value_set=self.drop)))


def minhash_dedup(ds: "ray.data.Dataset", id_col: str = "doc_id",
                  text_col: str = "text", threshold: float = 0.7,
                  columns: list[str] | None = None,
                  **lsh_kwargs) -> "ray.data.Dataset":
    """Full MinHash-LSH near-dedup → Dataset of surviving rows.

    Finalization is distributed (round-1 scale-killer #4 removed): the
    driver holds only candidate PAIRS and the union-find drop set
    (O(#duplicates)); survivors are produced by a broadcast ``pc.is_in``
    anti-filter over the streaming corpus — no O(corpus) driver arrays.
    """
    cand_tbls = list(minhash_candidates(ds, id_col, text_col, **lsh_kwargs)
                     .iter_batches(batch_format="pyarrow"))
    cand = (pa.concat_tables([t.select(["id_a", "id_b"]) for t in cand_tbls])
            if cand_tbls else pa.table({"id_a": pa.array([], pa.int64()),
                                        "id_b": pa.array([], pa.int64())}))
    dups = verify_jaccard(ds, cand, id_col, text_col, threshold=threshold)
    drop_ref = ray.put(pa.array(drop_ids_from_pairs(dups), pa.int64()))
    keep_cols = columns if columns is not None else [id_col]
    return ds.select_columns(keep_cols).map_batches(
        _DropFilter, fn_constructor_args=(drop_ref, id_col),
        batch_format="pyarrow", concurrency=(1, 8))


# ---------------------------------------------------------------------------
# SimHash


def _popcount64(v: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount over uint64 (no per-element Python)."""
    v = v.astype(np.uint64, copy=True)
    v -= (v >> np.uint64(1)) & np.uint64(0x5555555555555555)
    v = (v & np.uint64(0x3333333333333333)) + (
        (v >> np.uint64(2)) & np.uint64(0x3333333333333333))
    v = (v + (v >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    with np.errstate(over="ignore"):
        return ((v * np.uint64(0x0101010101010101))
                >> np.uint64(56)).astype(np.int32)


class SimHasher:
    """map_batches callable: 64-bit SimHash signature per document.

    sig bit j = sign of Σ_tokens (bit_j(hash(token)) ? +1 : −1); near-dups
    have small hamming distance. Banded into four 16-bit tables so any pair
    within hamming ≤ 3 of each other shares at least one exact band.
    """

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col

    def signature(self, batch: pa.Table) -> np.ndarray:
        tok_h, offsets = _token_hashes(batch.column(self.text_col))
        n_docs = len(offsets) - 1
        sig = np.zeros(n_docs, dtype=np.uint64)
        if tok_h.size:
            bits = np.unpackbits(tok_h.view(np.uint8).reshape(-1, 8),
                                 axis=1, bitorder="little").astype(np.int32)
            pm = bits * 2 - 1  # ±1 per bit
            starts = np.clip(offsets[:-1], 0, tok_h.size - 1)
            sums = np.add.reduceat(pm, starts, axis=0)
            lens = np.diff(offsets)
            sums[lens == 0] = 0
            bitvals = (sums > 0).astype(np.uint8)
            sig = np.packbits(bitvals, axis=1, bitorder="little").view(
                np.uint64).ravel()
        return sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        sig = self.signature(batch)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        n = sig.size
        bands = []
        for b in range(4):
            bands.append(((sig >> np.uint64(16 * b)) &
                          np.uint64(0xFFFF)).astype(np.int64))
        return pa.table({
            "band": pa.array(np.repeat(np.arange(4, dtype=np.int32), n)),
            "bucket": pa.array(np.concatenate(bands), pa.int64()),
            "id": pa.array(np.tile(ids, 4), pa.int64()),
            "sig": pa.array(np.tile(sig.astype(np.int64), 4), pa.int64()),
        })


def _simhash_segment_pairs(tbl: pa.Table, max_hamming: int,
                           skip_first_last: bool
                           ) -> tuple[pa.Table, pa.Table]:
    """Vectorized hamming-pair extraction over (band, bucket)-sorted rows;
    returns (pairs, boundary_rows) like ``_segment_pairs``."""
    n = tbl.num_rows
    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "hamming": pa.array([], pa.int32())})
    if n == 0:
        return empty, tbl
    band = tbl.column("band").to_numpy(zero_copy_only=False)
    bucket = tbl.column("bucket").to_numpy(zero_copy_only=False)
    ids = tbl.column("id").to_numpy(zero_copy_only=False)
    sigs = tbl.column("sig").to_numpy(zero_copy_only=False).astype(np.uint64)
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = (band[1:] != band[:-1]) | (bucket[1:] != bucket[:-1])
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], n)
    lens = ends - starts
    g_count = starts.size
    boundary = np.zeros(g_count, dtype=bool)
    if skip_first_last:
        boundary[0] = boundary[g_count - 1] = True
    a_p, b_p, h_p = [], [], []
    for g in np.flatnonzero((lens >= 2) & ~boundary):
        s, e = starts[g], ends[g]
        uniq, idx = np.unique(ids[s:e], return_index=True)
        if uniq.size < 2 or uniq.size > 256:
            continue
        sg = sigs[s:e][idx]
        iu = np.triu_indices(uniq.size, k=1)
        x = sg[iu[0]] ^ sg[iu[1]]
        ham = _popcount64(x)
        keep = ham <= max_hamming
        a_p.append(uniq[iu[0]][keep])
        b_p.append(uniq[iu[1]][keep])
        h_p.append(ham[keep])
    pairs = (pa.table({"id_a": pa.array(np.concatenate(a_p), pa.int64()),
                       "id_b": pa.array(np.concatenate(b_p), pa.int64()),
                       "hamming": pa.array(np.concatenate(h_p), pa.int32())})
             if a_p else empty)
    if skip_first_last:
        bnd_idx = (np.concatenate([np.arange(starts[0], ends[0]),
                                   np.arange(starts[g_count - 1],
                                             ends[g_count - 1])])
                   if g_count > 1 else np.arange(starts[0], ends[0]))
        boundary_rows = tbl.take(pa.array(np.unique(bnd_idx)))
    else:
        boundary_rows = tbl.slice(0, 0)
    return pairs, boundary_rows


def simhash_candidates(ds: "ray.data.Dataset", id_col: str = "doc_id",
                       text_col: str = "text", max_hamming: int = 3,
                       concurrency=None) -> "ray.data.Dataset":
    """SimHash near-dup candidate pairs with hamming distance filter.

    Same sorted-segment-scan shape as ``minhash_candidates`` (per-bucket
    map_groups overhead dominates at ~1 bucket per doc per band)."""
    banded = ds.select_columns([id_col, text_col]).map_batches(
        SimHasher, fn_constructor_kwargs=dict(id_col=id_col, text_col=text_col),
        batch_format="pyarrow", concurrency=concurrency or (1, 8)
    ).materialize()
    from ..stages.segments import shuffle_width
    nblocks = max(2, min(shuffle_width(banded),
                         max(2, banded.count() // 100_000)))
    srt = banded.repartition(nblocks).sort(["band", "bucket"])

    def block_pairs(batch: pa.Table) -> pa.Table:
        pairs, bnd = _simhash_segment_pairs(batch.combine_chunks(),
                                            max_hamming, skip_first_last=True)
        marker_cols = {
            "id_a": pa.array(np.full(bnd.num_rows, -1), pa.int64()),
            "id_b": bnd.column("id").cast(pa.int64()),
            "hamming": pa.nulls(bnd.num_rows, pa.int32()),
            "band": bnd.column("band").cast(pa.int64()),
            "bucket": bnd.column("bucket").cast(pa.int64()),
            "sig": bnd.column("sig").cast(pa.int64()),
        }
        pairs = pairs.append_column("band", pa.nulls(pairs.num_rows, pa.int64()))
        pairs = pairs.append_column("bucket", pa.nulls(pairs.num_rows, pa.int64()))
        pairs = pairs.append_column("sig", pa.nulls(pairs.num_rows, pa.int64()))
        return pa.concat_tables([pairs, pa.table(marker_cols)]) \
            if bnd.num_rows else pairs

    out = srt.map_batches(block_pairs, batch_format="pyarrow",
                          batch_size=None).materialize()
    tbls = list(out.iter_batches(batch_format="pyarrow"))
    if not tbls:
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "hamming": pa.array([], pa.int32())}))
    rows = pa.concat_tables(tbls)
    is_marker = pc.equal(rows.column("id_a"), -1)
    pairs_tbl = rows.filter(pc.invert(is_marker)).select(
        ["id_a", "id_b", "hamming"])
    markers = rows.filter(is_marker)
    if markers.num_rows:
        btbl = pa.table({"band": markers.column("band"),
                         "bucket": markers.column("bucket"),
                         "id": markers.column("id_b"),
                         "sig": markers.column("sig")})
        order = pc.sort_indices(btbl, sort_keys=[("band", "ascending"),
                                                 ("bucket", "ascending")])
        bpairs, _ = _simhash_segment_pairs(btbl.take(order), max_hamming,
                                           skip_first_last=False)
        pairs_tbl = pa.concat_tables([pairs_tbl, bpairs])
    return ray.data.from_arrow(pairs_tbl)


# ---------------------------------------------------------------------------
# Embedding cosine near-dup


class HyperplaneBucketer:
    """Random-hyperplane LSH for embeddings: bucket = sign bits of R·v.

    ``n_tables`` independent hash tables raise recall (a pair is a
    candidate if it collides in ANY table): P(hit) = 1 − (1 − p^b)^L with
    p = 1 − θ/π. Each table's bucket id is offset by ``table << n_bits``
    so one sort co-locates all tables at once. Embeddings are read from
    the Arrow list buffer (no per-row Python)."""

    def __init__(self, emb_col: str = "embedding", id_col: str = "vec_id",
                 n_bits: int = 12, dim: int = 64, n_tables: int = 1,
                 seed: int = 2023):
        rng = np.random.default_rng(seed)
        self.R = rng.standard_normal((dim, n_bits * n_tables))
        self.emb_col = emb_col
        self.id_col = id_col
        self.n_bits = n_bits
        self.n_tables = n_tables
        self.dim = dim

    def _matrix(self, emb) -> np.ndarray:
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = emb.values.to_numpy(zero_copy_only=False)
        offs = emb.offsets.to_numpy(zero_copy_only=False)
        return np.array(flat[offs[0]:offs[-1]], copy=True).reshape(
            -1, self.dim).astype(np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = batch.column(self.emb_col)
        mat = self._matrix(emb)
        bits = (mat @ self.R) > 0
        weights = (np.uint64(1) << np.arange(self.n_bits, dtype=np.uint64))
        n = mat.shape[0]
        buckets = np.empty(n * self.n_tables, dtype=np.int64)
        for t in range(self.n_tables):
            sub = bits[:, t * self.n_bits:(t + 1) * self.n_bits]
            code = (sub.astype(np.uint64) * weights).sum(axis=1)
            buckets[t * n:(t + 1) * n] = (code
                                          + (np.uint64(t) << np.uint64(
                                              self.n_bits))).astype(np.int64)
        norm = np.linalg.norm(mat, axis=1)
        ids = batch.column(self.id_col).cast(pa.int64())
        return pa.table({
            "bucket": pa.array(buckets, pa.int64()),
            "id": pa.concat_arrays([ids.combine_chunks()
                                    if isinstance(ids, pa.ChunkedArray)
                                    else ids] * self.n_tables),
            "emb": pa.concat_arrays([emb.combine_chunks()
                                     if isinstance(emb, pa.ChunkedArray)
                                     else emb] * self.n_tables),
            "norm": pa.array(np.tile(norm, self.n_tables), pa.float64()),
        })


def _emb_segment_pairs(tbl: pa.Table, threshold: float, dim: int,
                       max_bucket: int = 256) -> pa.Table:
    """Pairwise cosine within each bucket segment of a bucket-sorted table.

    One matmul per multi-member segment (rare); singleton segments cost a
    change-point scan only — the sorted-segment shape that replaced
    per-bucket ``map_groups`` across the dedup family."""
    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "cosine": pa.array([], pa.float64())})
    n = tbl.num_rows
    if n == 0:
        return empty
    bucket = tbl.column("bucket").to_numpy(zero_copy_only=False)
    ids = tbl.column("id").to_numpy(zero_copy_only=False)
    norms = tbl.column("norm").to_numpy(zero_copy_only=False)
    emb = tbl.column("emb")
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    flat = emb.values.to_numpy(zero_copy_only=False)
    offs = emb.offsets.to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(np.r_[True, bucket[1:] != bucket[:-1]])
    ends = np.append(starts[1:], n)
    a_p, b_p, c_p = [], [], []
    for g in np.flatnonzero((ends - starts) >= 2):
        s, e = int(starts[g]), int(ends[g])
        uniq, uidx = np.unique(ids[s:e], return_index=True)
        if uniq.size < 2 or uniq.size > max_bucket:
            continue
        rows = np.arange(s, e)[uidx]
        seg = np.stack([
            np.array(flat[offs[r]:offs[r + 1]], copy=True)
            for r in rows]).astype(np.float64)
        normed = seg / np.maximum(norms[rows], 1e-12)[:, None]
        sim = normed @ normed.T
        iu = np.triu_indices(uniq.size, k=1)
        sv = sim[iu]
        keep = sv >= threshold
        a_p.append(uniq[iu[0]][keep])
        b_p.append(uniq[iu[1]][keep])
        c_p.append(sv[keep])
    if not a_p:
        return empty
    return pa.table({"id_a": pa.array(np.concatenate(a_p), pa.int64()),
                     "id_b": pa.array(np.concatenate(b_p), pa.int64()),
                     "cosine": pa.array(np.concatenate(c_p), pa.float64())})


def embedding_dup_pairs(ds: "ray.data.Dataset", emb_col: str = "embedding",
                        id_col: str = "vec_id", threshold: float = 0.95,
                        n_bits: int = 12, dim: int = 64, n_tables: int = 1,
                        max_bucket: int = 256,
                        concurrency=None) -> "ray.data.Dataset":
    """Embedding-cosine near-dup pairs via hyperplane-LSH buckets.

    Bucket co-location is a sort + segment scan (NOT per-bucket
    ``map_groups`` — measured 2.4× slower in round 1); buckets cut at
    block edges are re-paired exactly from the re-emitted first/last
    segment rows (o(#blocks) rows), with pairs deduped downstream since a
    partial bucket's pairs are a subset of the full bucket's. Lowering
    ``n_bits`` / raising ``n_tables`` raises recall at the cost of bigger
    exchanges. Returns a Dataset of (id_a, id_b, cosine) — duplicates
    across tables/boundary possible; consumers dedupe (O(#pairs)).

    ``max_bucket`` caps the per-bucket pairwise matmul: buckets with more
    than ``max_bucket`` unique members are SKIPPED entirely (a degenerate
    bucket means the projection failed to discriminate — at n_bits below
    ~log2(n/max_bucket) this is a real, partitioning-sensitive recall
    loss: a cut bucket's edge slice may fall under the cap while the full
    bucket exceeds it). Measured on the 200k-vector bench (n_bits=14,
    n_tables=4): recall 99.9 % with the default cap; raise ``max_bucket``
    or ``n_bits`` if buckets overflow.
    """
    bucketed = ds.select_columns([id_col, emb_col]).map_batches(
        HyperplaneBucketer,
        fn_constructor_kwargs=dict(emb_col=emb_col, id_col=id_col,
                                   n_bits=n_bits, dim=dim,
                                   n_tables=n_tables),
        batch_format="pyarrow", concurrency=concurrency or (1, 8)
    ).materialize()
    # materialize BEFORE shuffle_width: size_bytes() on a lazy dataset
    # executes the plan, so an unmaterialized probe would run the whole
    # bucketing stage twice (measured 3× wall on the 200k bench); the sort
    # consumes the materialized set immediately anyway
    from ..stages.segments import shuffle_width
    srt = bucketed.repartition(shuffle_width(bucketed)).sort("bucket")

    def block_pairs(batch: pa.Table) -> pa.Table:
        b = batch.combine_chunks()
        pairs = _emb_segment_pairs(b, threshold, dim, max_bucket=max_bucket)
        n = b.num_rows
        if n == 0:
            return pairs.append_column(
                "bucket", pa.array([], pa.int64())).append_column(
                "id", pa.array([], pa.int64())).append_column(
                "norm", pa.array([], pa.float64())).append_column(
                "emb", pa.array([], b.schema.field("emb").type))
        bucket = b.column("bucket").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, bucket[1:] != bucket[:-1]])
        ends = np.append(starts[1:], n)
        bnd = np.unique(np.concatenate([
            np.arange(starts[0], ends[0]),
            np.arange(starts[-1], ends[-1])]))
        edge = b.take(pa.array(bnd))
        k = pairs.num_rows
        pairs = pairs.append_column("bucket", pa.nulls(k, pa.int64()))
        pairs = pairs.append_column("id", pa.nulls(k, pa.int64()))
        pairs = pairs.append_column("norm", pa.nulls(k, pa.float64()))
        pairs = pairs.append_column(
            "emb", pa.nulls(k, b.schema.field("emb").type))
        marker = pa.table({
            "id_a": pa.array(np.full(edge.num_rows, -1), pa.int64()),
            "id_b": pa.nulls(edge.num_rows, pa.int64()),
            "cosine": pa.nulls(edge.num_rows, pa.float64()),
            "bucket": edge.column("bucket"),
            "id": edge.column("id"),
            "norm": edge.column("norm"),
            "emb": edge.column("emb"),
        })
        return pa.concat_tables([pairs, marker])

    out = srt.map_batches(block_pairs, batch_format="pyarrow",
                          batch_size=None).materialize()
    rows_t = list(out.iter_batches(batch_format="pyarrow"))
    if not rows_t:
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64())}))
    rows = pa.concat_tables(rows_t, promote_options="permissive")
    is_marker = pc.equal(rows.column("id_a"), -1)
    pairs_tbl = rows.filter(pc.invert(is_marker)).select(
        ["id_a", "id_b", "cosine"])
    markers = rows.filter(is_marker)
    if markers.num_rows:
        btbl = markers.select(["bucket", "id", "emb", "norm"])
        order = pc.sort_indices(btbl, sort_keys=[("bucket", "ascending")])
        bpairs = _emb_segment_pairs(btbl.take(order), threshold, dim,
                                    max_bucket=max_bucket)
        pairs_tbl = pa.concat_tables([pairs_tbl, bpairs])
    if pairs_tbl.num_rows:
        pdf = pairs_tbl.to_pandas().drop_duplicates(["id_a", "id_b"])
        pairs_tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    return ray.data.from_arrow(pairs_tbl)


def jaccard_dup_pairs(ds: "ray.data.Dataset", id_col: str = "doc_id",
                      text_col: str = "text", threshold: float = 0.7,
                      k: int = 3, max_rows: int = 200_000) -> pa.Table:
    """EXACT word-k-shingle Jaccard duplicate pairs via a distributed
    shingle inverted index — the n-gram-Jaccard family's SQL-checkable
    exact variant (same role as :func:`embedding_all_pairs_exact`; the
    scale route is ``minhash_dedup``, whose LSH approximates exactly this
    measure; reference gap — it has no near-dedup at all, SURVEY.md §2.7).

    Shape: one stateless pass emits the DISTINCT ``(shingle, doc_id)``
    rows per document (shingles as ``\\x1f``-joined token strings so the
    result is bit-identical to a SQL string self-join — no hashing, no
    collision caveat); one sort exchange on ``shingle`` feeds vectorized
    per-segment pair emission (stages/segments.py — block-cut segments
    re-stitched exactly); a ``groupby (a, b)`` count gives |A∩B|; per-doc
    set sizes are a o(#docs) driver dict. A shingle shared by s docs emits
    s(s-1)/2 pair rows — quadratic in posting size, hence the ``max_rows``
    guard: above it, use ``minhash_dedup`` + ``verify_jaccard``.
    """
    # materialize ONCE up front (ADVICE r3): count() on the lazy read would
    # execute the upstream, and the shingle pass would re-execute it — the
    # exact double-execution pattern shuffle_width's contract forbids. The
    # guard caps input at max_rows so materializing is cheap by definition.
    ds = ds.materialize()
    n_rows = ds.count()
    if n_rows > max_rows:
        raise ValueError(
            f"jaccard_dup_pairs is the exact inverted-index baseline "
            f"(posting lists pair quadratically): input has {n_rows} rows "
            f"> max_rows={max_rows}. Use minhash_dedup + verify_jaccard "
            f"for large corpora, or raise max_rows explicitly.")

    def emit_shingles(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(batch.column(text_col), "")),
            r"\s+").to_pylist()
        out_id, out_sh = [], []
        for did, tl in zip(ids, toks):
            if tl is None or len(tl) < k:
                continue
            seen = {"\x1f".join(tl[i:i + k]) for i in range(len(tl) - k + 1)}
            out_id.extend([did] * len(seen))
            out_sh.extend(seen)
        return pa.table({"shingle": pa.array(out_sh, pa.large_string()),
                         "doc_a": pa.array(out_id, pa.int64())})

    emitted = ds.select_columns([id_col, text_col]).map_batches(
        emit_shingles, batch_format="pyarrow").materialize()

    sizes_tbl = _tbl_from_ds(emitted.groupby("doc_a").count())
    sizes = dict(zip(sizes_tbl.column("doc_a").to_pylist(),
                     sizes_tbl.column("count()").to_pylist()))

    from ..stages.segments import sorted_segment_map
    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])

    def seg_pairs(batch: pa.Table, starts: np.ndarray, ends: np.ndarray
                  ) -> pa.Table:
        ids = batch.column("doc_a").to_numpy(zero_copy_only=False)
        a_parts, b_parts = [], []
        for g in np.flatnonzero(ends - starts >= 2):
            seg = ids[starts[g]:ends[g]]
            iu = np.triu_indices(seg.size, k=1)
            a_parts.append(seg[iu[0]])
            b_parts.append(seg[iu[1]])
        if not a_parts:
            return pair_schema.empty_table()
        return pa.table({"a": pa.array(np.concatenate(a_parts), pa.int64()),
                         "b": pa.array(np.concatenate(b_parts), pa.int64())},
                        schema=pair_schema)

    counts = _tbl_from_ds(sorted_segment_map(
        emitted, "shingle", ["doc_a"], seg_pairs, pair_schema)
        .groupby(["a", "b"]).count())
    if counts.num_rows == 0:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    a = counts.column("a").to_numpy(zero_copy_only=False)
    b = counts.column("b").to_numpy(zero_copy_only=False)
    c = counts.column("count()").to_numpy(zero_copy_only=False).astype(
        np.float64)
    na = np.array([sizes[x] for x in a], dtype=np.float64)
    nb = np.array([sizes[x] for x in b], dtype=np.float64)
    jac = c / (na + nb - c)
    keep = jac >= threshold
    out = pa.table({"a": pa.array(a[keep], pa.int64()),
                    "b": pa.array(b[keep], pa.int64()),
                    "jaccard": pa.array(jac[keep], pa.float64())})
    return out.take(pc.sort_indices(out, sort_keys=[("a", "ascending"),
                                                    ("b", "ascending")]))


def embedding_all_pairs_exact(ds: "ray.data.Dataset",
                              emb_col: str = "embedding",
                              id_col: str = "vec_id",
                              threshold: float = 0.45,
                              dim: int = 64,
                              max_rows: int = 500_000) -> pa.Table:
    """EXACT all-pairs cosine ≥ threshold — the brute-force baseline the
    LSH path approximates (and the SQL-checkable variant: a DuckDB
    self-join computes the same O(n²) result).

    Shape: the normalized matrix is broadcast ONCE via ``ray.put`` and the
    corpus streams through a stateless map_batches computing a
    rows-of-batch × all matmul with an id_a < id_b mask — O(n²/P) compute
    per task, no shuffle. The broadcast side must fit in worker memory
    (n·dim floats); inputs above ``max_rows`` raise rather than silently
    collecting a large corpus onto the driver — use
    ``embedding_dup_pairs`` (LSH) there; exact all-pairs at 100 TB is
    inherently quadratic.
    """
    import ray as _ray
    n_rows = ds.count()
    if n_rows > max_rows:
        raise ValueError(
            f"embedding_all_pairs_exact is the O(n²) small-scale oracle "
            f"baseline: input has {n_rows} rows > max_rows={max_rows}. "
            f"Use embedding_dup_pairs (hyperplane LSH) for large corpora, "
            f"or raise max_rows explicitly if the broadcast matrix fits.")
    base = _tbl_from_ds(ds.select_columns([id_col, emb_col]))
    ids_all = base.column(id_col).to_numpy(zero_copy_only=False)
    emb = base.column(emb_col)
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    flat = emb.values.to_numpy(zero_copy_only=False)
    offs = emb.offsets.to_numpy(zero_copy_only=False)
    mat = np.array(flat[offs[0]:offs[-1]], copy=True).reshape(
        -1, dim).astype(np.float64)
    normed = mat / np.maximum(np.linalg.norm(mat, axis=1), 1e-12)[:, None]
    ref = _ray.put((ids_all, normed))

    class BlockPairs:
        def __init__(self, r):
            self.ids, self.normed = _ray.get(r)

        def __call__(self, batch: pa.Table) -> pa.Table:
            bids = batch.column(id_col).to_numpy(zero_copy_only=False)
            e = batch.column(emb_col)
            if isinstance(e, pa.ChunkedArray):
                e = e.combine_chunks()
            f = e.values.to_numpy(zero_copy_only=False)
            o = e.offsets.to_numpy(zero_copy_only=False)
            m = np.array(f[o[0]:o[-1]], copy=True).reshape(
                -1, dim).astype(np.float64)
            m = m / np.maximum(np.linalg.norm(m, axis=1), 1e-12)[:, None]
            sim = m @ self.normed.T                      # (batch, n)
            keep = (sim >= threshold) & (bids[:, None] < self.ids[None, :])
            r, c = np.nonzero(keep)
            return pa.table({
                "id_a": pa.array(bids[r], pa.int64()),
                "id_b": pa.array(self.ids[c], pa.int64()),
                "cosine": pa.array(sim[r, c], pa.float64())})

    parts = list(ds.select_columns([id_col, emb_col]).map_batches(
        BlockPairs, fn_constructor_args=(ref,), batch_format="pyarrow",
        concurrency=(1, 8)).iter_batches(batch_format="pyarrow"))
    out = (pa.concat_tables(parts) if parts else
           pa.table({"id_a": pa.array([], pa.int64()),
                     "id_b": pa.array([], pa.int64()),
                     "cosine": pa.array([], pa.float64())}))
    order = pc.sort_indices(out, sort_keys=[("id_a", "ascending"),
                                            ("id_b", "ascending")])
    return out.take(order)


def _tbl_from_ds(ds: "ray.data.Dataset") -> pa.Table:
    tables = list(ds.iter_batches(batch_format="pyarrow"))
    return pa.concat_tables(tables) if tables else pa.table({})


# ---------------------------------------------------------------------------
# Exact dedup


def _key_change_mask(tbl: pa.Table, key_cols: list[str]) -> np.ndarray:
    """Null-safe per-row group-change mask over a key-sorted table.

    numpy object comparison treats None != None and NaN != NaN as True,
    which would make every null-keyed row its own group (diverging from the
    SQL oracle's GROUP BY, which collapses NULLs); pandas ``ne`` + explicit
    both-null handling keeps null keys in one group.
    """
    n = tbl.num_rows
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for c in key_cols:
        s = pd.Series(tbl.column(c).to_numpy(zero_copy_only=False))
        prev = s.shift()
        ch = (s.ne(prev) & ~(s.isna() & prev.isna())).to_numpy(dtype=bool)
        change |= ch
    change[0] = True
    return change


def exact_dedup(ds: "ray.data.Dataset", key_cols: list[str],
                id_col: str) -> "ray.data.Dataset":
    """Keep the min-id row per key group (D1).

    Shape: range-partition sort by (key..., id) → the min-id row of every
    group is simply the FIRST row of its segment — one vectorized take per
    block, zero per-group Python; groups cut at block edges are resolved
    from the o(#blocks) boundary rows on the driver."""
    from ..stages.segments import shuffle_width
    ds = ds.materialize()  # size_bytes() on a lazy ds would execute it;
    # unmaterialized, the sort would then execute it a second time
    srt = ds.repartition(shuffle_width(ds)).sort(
        list(key_cols) + [id_col])

    def block_first(batch: pa.Table) -> pa.Table:
        b = batch.combine_chunks()
        n = b.num_rows
        if n == 0:
            return b.append_column("__edge", pa.array([], pa.bool_()))
        starts = np.flatnonzero(_key_change_mask(b, key_cols))
        keep = b.take(pa.array(starts))
        # first and last group of the block may continue in neighbors
        edge = np.zeros(starts.size, dtype=bool)
        edge[0] = True
        edge[-1] = True
        return keep.append_column("__edge", pa.array(edge))

    out = srt.map_batches(block_first, batch_format="pyarrow",
                          batch_size=None).materialize()
    interior = out.map_batches(
        lambda b: b.filter(pc.invert(b.column("__edge")))
        .drop_columns(["__edge"]), batch_format="pyarrow")
    edge_tbls = list(out.map_batches(
        lambda b: b.filter(b.column("__edge")).drop_columns(["__edge"]),
        batch_format="pyarrow").iter_batches(batch_format="pyarrow"))
    if edge_tbls:
        e = pa.concat_tables(edge_tbls)
        order = pc.sort_indices(e, sort_keys=[
            (c, "ascending") for c in key_cols] + [(id_col, "ascending")])
        e = e.take(order)
        fixed = e.take(pa.array(np.flatnonzero(_key_change_mask(e, key_cols))))
        return interior.union(ray.data.from_arrow(fixed))
    return interior
