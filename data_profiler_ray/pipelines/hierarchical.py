"""Hierarchical (nested JSON) profiling — SURVEY.md A21 / S5.

The reference flattens nested JSON to dotted column names via the capitalone
DataProfiler library and profiles depth structure
(``/root/reference/stelardataprofiler/hierarchical/profiler.py:77-128``).
Here: ``ray.data.read_json`` → recursive Arrow struct flattening inside
``map_batches`` (dotted names encode nesting, same convention) → the
standard distributed profile, plus the depth-distribution block:
nesting level per attribute, distinct attribute count per level, and the
A13 describe bundle over levels.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..config import ProfileConfig
from ..stages.profile import profile_dataset


def flatten_structs(batch: pa.Table, sep: str = ".") -> pa.Table:
    """Recursively flatten struct columns into dotted top-level columns
    (hierarchical/profiler.py:94-96 naming convention). List columns are
    kept opaque (stringified) — the reference's flattener does the same for
    arrays of records it cannot index."""
    import pyarrow.compute as pc
    while any(pa.types.is_struct(f.type) for f in batch.schema):
        cols, names = [], []
        for name, col in zip(batch.column_names, batch.columns):
            if pa.types.is_struct(col.type):
                col = col.combine_chunks() if isinstance(
                    col, pa.ChunkedArray) else col
                for i, sub in enumerate(col.type):
                    names.append(f"{name}{sep}{sub.name}")
                    cols.append(col.field(i))
            else:
                names.append(name)
                cols.append(col)
        batch = pa.table(dict(zip(names, cols)))
    # lists → deterministic string form so they profile as Textual
    out = {}
    for name, col in zip(batch.column_names, batch.columns):
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            out[name] = pa.array(
                [None if v is None else str(v) for v in col.to_pylist()],
                pa.string())
        else:
            out[name] = col
    return pa.table(out)


def profile_hierarchical(path_or_ds, sep: str = ".") -> dict:
    """JSON profile with depth distribution (profiler.py:87-128)."""
    if isinstance(path_or_ds, ray.data.Dataset):
        ds = path_or_ds
    else:
        ds = ray.data.read_json(path_or_ds)
    flat = ds.map_batches(lambda b: flatten_structs(b, sep),
                          batch_format="pyarrow")
    prof = profile_dataset(flat, ProfileConfig(title="hierarchical"))
    prof["table"]["profiler_type"] = "Hierarchical"

    names = [v["name"] for v in prof["variables"]]
    depths = [n.count(sep) + 1 for n in names]
    per_level: dict[int, int] = {}
    for d in depths:
        per_level[d] = per_level.get(d, 0) + 1
    import numpy as np
    arr = np.asarray(depths, dtype=np.float64)
    prof["table"]["depth"] = {
        "max_level": int(arr.max()) if arr.size else 0,
        "attributes_per_level": {int(k): v for k, v in sorted(per_level.items())},
        "distribution": {
            "count": int(arr.size),
            "mean": float(arr.mean()) if arr.size else None,
            "std": float(arr.std(ddof=1)) if arr.size > 1 else None,
            "min": float(arr.min()) if arr.size else None,
            "max": float(arr.max()) if arr.size else None,
            "median": float(np.median(arr)) if arr.size else None,
        },
    }
    # per-attribute uniqueness ratio (profiler.py:120-128)
    for v in prof["variables"]:
        cnt = v.get("count", 0)
        v["uniqueness_ratio"] = (v.get("n_distinct", 0) / cnt) if cnt else 0.0
    return prof
