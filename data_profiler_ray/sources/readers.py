"""Input readers: the reference's ingest surface, Ray-Data-native.

Covers SURVEY.md §2.1 S1/S3/S5 (CSV with header/sep/encoding, tabular
dispatch, JSON) — each returns a streaming ``ray.data.Dataset``; nothing is
materialized driver-side. The reference reads whole files into pandas
(``/root/reference/stelardataprofiler/tabular_timeseries/variables/
utils.py:21-27,58-111``); here files become block-parallel datasets and the
ts-mode datetime sort becomes an explicit ``ds.sort`` (duplicate index rows
are NOT silently dropped — they surface as uniqueness violations, SURVEY.md
§2.7 D1).

Shapefile / RDF / raster readers (S2/S6/S7/S8) are out of scope per
SURVEY.md §2.1; geometry columns, when present, stay WKT strings.
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data


def read_tabular(path: str | list[str], header: int | None = 0,
                 sep: str = ",", encoding: str = "utf-8",
                 ts_mode_datetime_col: str | None = None,
                 extra_geometry_columns: list[dict] | None = None
                 ) -> "ray.data.Dataset":
    """Dispatch on extension: parquet / csv / json (reference
    ``read_tabular_timeseries`` dispatch, utils.py:58-111).

    ``ts_mode_datetime_col``: sort the dataset by that column (the
    reference's ts-mode index sort, utils.py:100-102) — duplicates are kept.

    ``extra_geometry_columns``: list of ``{"latitude": col, "longitude":
    col}`` dicts — each pair derives a WKT point column named
    ``geometry_<lon>_<lat>`` (reference utils.py:82-90, GeoSeries.from_xy →
    to_wkt; here a stateless vectorized map_batches, no geo libraries).
    """
    paths = [path] if isinstance(path, str) else list(path)
    ext = os.path.splitext(paths[0])[1].lower()
    if ext in (".parquet", ".pq"):
        ds = ray.data.read_parquet(paths)
    elif ext in (".csv", ".txt", ".tsv"):
        from pyarrow import csv as pacsv
        read_options = pacsv.ReadOptions(
            autogenerate_column_names=header is None, encoding=encoding)
        parse_options = pacsv.ParseOptions(delimiter=sep)
        ds = ray.data.read_csv(paths, read_options=read_options,
                               parse_options=parse_options)
    elif ext in (".json", ".jsonl", ".ndjson"):
        ds = ray.data.read_json(paths)
    else:
        raise ValueError(f"unsupported input extension {ext!r}")
    if extra_geometry_columns:
        names = ds.schema().names
        pairs = [(d["longitude"], d["latitude"])
                 for d in extra_geometry_columns
                 if d.get("latitude") in names and d.get("longitude") in names]
        if pairs:
            ds = ds.map_batches(_DeriveGeometry(pairs),
                                batch_format="pyarrow")
    if ts_mode_datetime_col:
        ds = ds.sort(ts_mode_datetime_col)
    return ds


class _DeriveGeometry:
    """map_batches callable: lat/lon float pairs → ``POINT (lon lat)`` WKT
    strings (shapely-style: ≤6 decimals, trailing zeros trimmed)."""

    def __init__(self, lon_lat_pairs: list[tuple[str, str]]):
        self.pairs = lon_lat_pairs

    @staticmethod
    def _fmt(v: float) -> str:
        import numpy as np
        if v is None or (isinstance(v, float) and np.isnan(v)):
            return None
        return np.format_float_positional(round(float(v), 6), trim="-")

    def __call__(self, batch: pa.Table) -> pa.Table:
        for lon, lat in self.pairs:
            xs = batch.column(lon).to_pylist()
            ys = batch.column(lat).to_pylist()
            wkt = []
            for x, y in zip(xs, ys):
                fx, fy = self._fmt(x), self._fmt(y)
                wkt.append(None if fx is None or fy is None
                           else f"POINT ({fx} {fy})")
            batch = batch.append_column(f"geometry_{lon}_{lat}",
                                        pa.array(wkt, pa.string()))
        return batch


def normalize_columns(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Reference ``prepare_df`` (utils.py:46-55): stringified column names,
    ``index`` renamed to ``df_index``."""
    names = ds.schema().names
    renames = {}
    for n in names:
        target = "df_index" if str(n) == "index" else str(n)
        if target != n:
            renames[n] = target
    return ds.rename_columns(renames) if renames else ds


def read_transcripts(path_or_dir: str) -> "ray.data.Dataset":
    """Transcript-table reader: parquet dir/file(s) with the BASELINE.json
    input_hint schema. Columns are projected/validated lazily."""
    if os.path.isdir(path_or_dir):
        return ray.data.read_parquet(path_or_dir)
    return ray.data.read_parquet([path_or_dir])


def write_profile_json(profile: dict, output_file: str) -> str:
    """Reference ``write_to_json`` (utils.py:28-75): JSON-safe coercion of
    numpy scalars/arrays/sets, indent=3."""
    import json

    import numpy as np

    def default(o):
        if isinstance(o, (np.integer,)):
            return int(o)
        if isinstance(o, (np.floating,)):
            return float(o)
        if isinstance(o, np.ndarray):
            return o.tolist()
        if isinstance(o, (set, frozenset)):
            return sorted(o)
        if isinstance(o, bytes):
            return o.decode("utf-8", "replace")
        return str(o)

    os.makedirs(os.path.dirname(os.path.abspath(output_file)), exist_ok=True)
    with open(output_file, "w") as f:
        json.dump(profile, f, indent=3, default=default)
    return output_file


def read_text_corpus(paths: str | list[str]) -> "ray.data.Dataset":
    """S4: whole text files as documents — one row per file with the
    reference's normalization (whitespace collapse; reference ASCII-coerces,
    ``text/profiler.py:190,224-227`` — kept as UTF-8 here, the char-class
    kernels ignore non-ASCII bytes the same way)."""
    import pyarrow.compute as pc
    ds = ray.data.read_binary_files(paths, include_paths=True)

    def decode(batch: pa.Table) -> pa.Table:
        texts = [b.decode("utf-8", "replace") for b in
                 batch.column("bytes").to_pylist()]
        arr = pc.replace_substring_regex(
            pa.array(texts, pa.string()), r"\s+", " ")
        return pa.table({"path": batch.column("path"), "text": arr})
    return ds.map_batches(decode, batch_format="pyarrow")
