"""Deterministic sampling / dataset-split operators.

Training-data pipelines need key-stable splits: a document must land in the
same split regardless of shard order, worker count or rerun — so splits are
a pure function of the key, never of position or RNG state. (The reference
has no sampling ops at all; SURVEY.md §2 — this is part of the
training-data surface the round brief adds.)

``hash_split`` uses the Knuth multiplicative hash
``u = ((key + seed) * 2654435761) mod 2^32 / 2^32`` for integer keys —
chosen over the engine's 64-bit string hash because it is exactly
reproducible in ANSI SQL (the DuckDB oracle runs the same arithmetic), so
the split assignment itself is driver-verifiable. String keys are first
mapped through ``hash_string_array`` (byte-level, deterministic) and then
take the same integer path (covered by pytest, not SQL).

Shape: stateless ``map_batches`` over Arrow — no shuffle, no driver state;
filtering one split is an ordinary vectorized filter.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

KNUTH = np.uint64(2654435761)
MOD32 = np.uint64(1 << 32)


def split_hash32(keys: np.ndarray, seed: int) -> np.ndarray:
    """((key + seed) * 2654435761) mod 2^32 — uint64 in [0, 2^32)."""
    with np.errstate(over="ignore"):
        h = (keys.astype(np.uint64) + np.uint64(seed)) * KNUTH
    return h % MOD32


def split_edges(ratios: dict[str, float]) -> list[int]:
    """Integer u-thresholds floor(cum_ratio · 2^32) — comparisons happen in
    EXACT integer space (a float edge like 0.8+0.1 = 0.9000000000000001
    could straddle the SQL literal 0.9 and flip a key's split)."""
    cum = 0.0
    edges = []
    for r in ratios.values():
        cum += r
        edges.append(int(np.floor(cum * float(MOD32))))
    edges[-1] = max(edges[-1], int(MOD32))  # remainder → last split
    return edges


class HashSplitter:
    """map_batches callable: append a ``split`` column keyed on ``id_col``.

    ``ratios`` maps split name → fraction; names are assigned in the given
    order over cumulative integer thresholds (fractions must sum to ≤ 1;
    any remainder falls into the LAST split).
    """

    def __init__(self, id_col: str, ratios: dict[str, float],
                 seed: int = 2023):
        self.id_col = id_col
        self.names = list(ratios)
        self.edges = np.array(split_edges(ratios), dtype=np.uint64)
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.id_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            from .text import hash_string_array
            keys = hash_string_array(col)
        else:
            keys = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        h = split_hash32(keys, self.seed)
        idx = np.searchsorted(self.edges, h, side="right")
        idx = np.minimum(idx, len(self.names) - 1)
        names = np.array(self.names, dtype=object)[idx]
        out = pa.array(names, pa.string())
        if "split" in batch.column_names:
            return batch.set_column(batch.column_names.index("split"),
                                    "split", out)
        return batch.append_column("split", out)


def hash_split(ds: "ray.data.Dataset", id_col: str,
               ratios: dict[str, float], seed: int = 2023
               ) -> "ray.data.Dataset":
    """Append a deterministic key-hash ``split`` column (train/val/test)."""
    return ds.map_batches(
        HashSplitter, fn_constructor_args=(id_col, ratios, seed),
        batch_format="pyarrow", concurrency=(1, 8))


def split_filter(ds: "ray.data.Dataset", id_col: str,
                 ratios: dict[str, float], keep: str,
                 seed: int = 2023) -> "ray.data.Dataset":
    """Stream only one split — the common training-read path."""
    splitter = HashSplitter(id_col, ratios, seed)

    def f(batch: pa.Table) -> pa.Table:
        with_split = splitter(batch)
        return with_split.filter(
            pc.equal(with_split.column("split"), keep)).drop_columns(
            ["split"])

    return ds.map_batches(f, batch_format="pyarrow")


class StratifiedSampler:
    """map_batches callable: deterministic per-stratum sampling.

    A row is kept iff ``split_hash32(key, seed) < floor(frac[stratum] ·
    2^32)`` — a pure function of (key, stratum): shard order, worker count
    and reruns cannot move a row in or out of the sample, and the integer
    thresholds replicate exactly in ANSI SQL (HUGEINT arithmetic, same as
    ``hash_split``). Strata missing from ``fracs`` use ``default_frac``.
    """

    def __init__(self, id_col: str, strata_col: str,
                 fracs: dict[str, float], seed: int = 2023,
                 default_frac: float = 0.0):
        self.id_col = id_col
        self.strata_col = strata_col
        self.thresholds = {s: int(np.floor(min(max(f, 0.0), 1.0)
                                           * float(MOD32)))
                           for s, f in fracs.items()}
        self.default_thr = int(np.floor(min(max(default_frac, 0.0), 1.0)
                                        * float(MOD32)))
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd
        col = batch.column(self.id_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            from .text import hash_string_array
            keys = hash_string_array(col)
        else:
            keys = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        h = split_hash32(keys, self.seed)
        strata = pd.Series(batch.column(self.strata_col).to_pandas())
        thr = strata.map(self.thresholds).fillna(self.default_thr).to_numpy(
            dtype=np.uint64)
        return batch.filter(pa.array(h < thr))


def stratified_sample(ds: "ray.data.Dataset", id_col: str, strata_col: str,
                      fracs: dict[str, float], seed: int = 2023,
                      default_frac: float = 0.0) -> "ray.data.Dataset":
    """Deterministic stratified sampling: keep ``fracs[stratum]`` of each
    stratum, keyed on ``id_col`` (stateless map_batches — no shuffle)."""
    return ds.map_batches(
        StratifiedSampler,
        fn_constructor_args=(id_col, strata_col, fracs, seed, default_frac),
        batch_format="pyarrow", concurrency=(1, 8))
