"""Custom join/window operators Ray Data lacks natively.

- ``asof_join``: for each left row, attach the most recent right row with
  ``right.ts <= left.ts`` within the same key (a time-travel lookup). The
  right side is BROADCAST (sorted per key once, in every task via
  constructor arg) — correct choice when the right side is a dimension /
  rate table ≪ left. For a large right side the same kernel applies after
  a co-partitioning ``groupby(key)`` on the union of both sides
  (partitioning assumption: both sides hash-partitioned on ``by``).
- ``rolling_window``: per-key ordered rolling aggregate (mean/sum over the
  trailing N rows), vectorized with cumsum inside ``map_groups``.

Both document the reference-gap: the reference performs no relational joins
at all (SURVEY.md §2.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


class _AsOfLookup:
    """map_batches callable holding the broadcast right side, pre-sorted and
    split per key in ``__init__`` (once per actor)."""

    def __init__(self, right_ref, by: str, on: str, value_cols: list[str]):
        right = ray.get(right_ref) if isinstance(right_ref, ray.ObjectRef) \
            else right_ref
        self.by = by
        self.on = on
        self.value_cols = value_cols
        self.lookup: dict = {}
        order = pc.sort_indices(right, sort_keys=[(by, "ascending"),
                                                  (on, "ascending")])
        r = right.take(order)
        keys = r.column(by).to_numpy(zero_copy_only=False)
        ts = r.column(on).cast(pa.int64()).to_numpy(zero_copy_only=False)
        vals = {c: r.column(c).to_numpy(zero_copy_only=False)
                for c in value_cols}
        change = np.r_[True, keys[1:] != keys[:-1]]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], keys.size)
        for s, e in zip(starts, ends):
            self.lookup[keys[s]] = (
                ts[s:e], {c: v[s:e] for c, v in vals.items()})

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.by).to_numpy(zero_copy_only=False)
        ts = batch.column(self.on).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        n = len(batch)
        out = {c: np.full(n, np.nan) for c in self.value_cols}
        # vectorize per distinct key in the batch (few keys ≫ rows each)
        order = np.argsort(keys, kind="stable")
        ks, tss = keys[order], ts[order]
        change = np.r_[True, ks[1:] != ks[:-1]]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        for s, e in zip(starts, ends):
            entry = self.lookup.get(ks[s])
            if entry is None:
                continue
            r_ts, r_vals = entry
            idx = np.searchsorted(r_ts, tss[s:e], side="right") - 1
            valid = idx >= 0
            rows = order[s:e]
            for c in self.value_cols:
                vals = out[c]
                vals[rows[valid]] = r_vals[c][idx[valid]]
        for c in self.value_cols:
            batch = batch.append_column(f"{c}_asof", pa.array(out[c]))
        return batch


def asof_join(left: "ray.data.Dataset", right: pa.Table, by: str, on: str,
              value_cols: list[str], concurrency=None) -> "ray.data.Dataset":
    """Broadcast as-of join: latest right row with right.on <= left.on per key."""
    right_ref = ray.put(right)
    return left.map_batches(
        _AsOfLookup, fn_constructor_args=(right_ref, by, on, value_cols),
        batch_format="pyarrow", concurrency=concurrency or (1, 4))


def rolling_window(ds: "ray.data.Dataset", by: str, order_cols: list[str],
                   value_col: str, window: int,
                   agg: str = "mean") -> "ray.data.Dataset":
    """Per-key trailing-window aggregate (ROWS BETWEEN window-1 PRECEDING AND
    CURRENT ROW), cumsum-vectorized inside each group."""

    def roll(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[(c, "ascending") for c in order_cols])
        g = group.take(order)
        x = g.column(value_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        n = x.size
        cs = np.concatenate([[0.0], np.cumsum(x)])
        lo = np.maximum(np.arange(n) - window + 1, 0)
        sums = cs[np.arange(n) + 1] - cs[lo]
        counts = np.arange(n) + 1 - lo
        val = sums / counts if agg == "mean" else sums
        return g.append_column(f"{value_col}_rolling_{agg}",
                               pa.array(val, pa.float64()))

    return ds.groupby(by).map_groups(roll, batch_format="pyarrow")
