"""Raster (VISTA LAI) profiling pipeline — Ray-Data-first.

Reference behaviour: ``profile_vista_rasters`` walks a ``.ras`` blob
image-by-image in ONE process, computing per-image LAI band stats +
NODATA distribution and then a cross-image combined block
(``/root/reference/stelardataprofiler/raster/profiler.py:557-880``).
Here the same outputs come from a Dataset of one row per image:

    vista_to_table(rhd, ras)  →  (image_id, name, date, rows, cols,
                                  payload)  [one Arrow row per image]
    ds.map_batches(_partial)   →  fixed-size per-image partial states
    driver merge (O(#images))  →  reference-shaped profile dict

The payloads fan out across the cluster as ordinary blocks and never
enter a shuffle; per-image partials are bounded (moments + KLL + sentinel
counters), so the final merge touches kilobytes per image regardless of
image size. Combined variance is Chan-exact (the reference's
std-for-variance slip at ``profiler.py:864`` is intentionally not
replicated — SURVEY A19).
"""

from __future__ import annotations

import pickle

import numpy as np
import pyarrow as pa

import ray.data

from ..functions.raster import (BandStats, decode_vista_image,
                                image_band_partial, nodata_distribution,
                                parse_rhd, NODATA_LABELS, VISTA_LAI_TYPE)

RASTER_SCHEMA = pa.schema([
    ("image_id", pa.int64()),
    ("name", pa.string()),
    ("date", pa.string()),
    ("rows", pa.int32()),
    ("cols", pa.int32()),
    ("lai", pa.bool_()),            # vista_data_type 7 decode
    ("payload", pa.large_binary()),  # raw int16 pixels of THIS image
])


def vista_to_table(rhd_text: str, ras_payload: bytes,
                   name: str = "vista") -> pa.Table:
    """Split a ``.rhd``/``.ras`` pair into one table row per image —
    the resumable unit a 100-TB archive would be partitioned by."""
    rhd = parse_rhd(rhd_text)
    rows, cols = rhd["rows"], rhd["columns"]
    px_bytes = rows * cols * 2
    if len(ras_payload) < px_bytes * rhd["n_images"]:
        raise ValueError("vista: ras shorter than header promises")
    lai = rhd["vista_data_type"] == VISTA_LAI_TYPE
    return pa.table({
        "image_id": pa.array(range(rhd["n_images"]), pa.int64()),
        "name": pa.array([f"{name}_{i}" for i in range(rhd["n_images"])]),
        "date": pa.array([im["date"] for im in rhd["images"]]),
        "rows": pa.array([rows] * rhd["n_images"], pa.int32()),
        "cols": pa.array([cols] * rhd["n_images"], pa.int32()),
        "lai": pa.array([lai] * rhd["n_images"]),
        "payload": pa.array(
            [ras_payload[i * px_bytes:(i + 1) * px_bytes]
             for i in range(rhd["n_images"])], pa.large_binary()),
    }, schema=RASTER_SCHEMA)


def _image_partials(batch: pa.Table) -> pa.Table:
    """Stateless map_batches stage: decode each image, emit a pickled
    fixed-size partial (band stats + sentinel counts) per image."""
    out_states = []
    for name, date, rows, cols, lai, payload in zip(
            batch.column("name").to_pylist(),
            batch.column("date").to_pylist(),
            batch.column("rows").to_pylist(),
            batch.column("cols").to_pylist(),
            batch.column("lai").to_pylist(),
            batch.column("payload").to_pylist()):
        img = decode_vista_image(payload, rows, cols, lai=lai)
        part = image_band_partial(img)
        part.update(name=name, date=date, rows=rows, cols=cols)
        out_states.append(pickle.dumps(part))
    return pa.table({
        "image_id": batch.column("image_id"),
        "state": pa.array(out_states, pa.large_binary()),
    })


def profile_raster_dataset(ds: "ray.data.Dataset") -> dict:
    """Profile a per-image raster Dataset into the reference's VISTA
    profile shape: per-image ``variables`` (band stats + NODATA
    distribution) and the combined LAI block (count/min/max/
    count-weighted mean/EXACT pooled variance/lai_distribution)."""
    # take_all() here touches ONLY the reduced partials — O(#images)
    # kilobyte states, never pixels (the profile_dataset contract)
    states = [pickle.loads(r["state"]) for r in
              ds.map_batches(_image_partials, batch_format="pyarrow")
              .sort("image_id").take_all()]

    variables, imgs, lai_pcts = [], [], []
    combined = BandStats()
    pooled_nodata = {label: 0 for label in NODATA_LABELS.values()}
    pooled_zeros = 0
    total_px = 0
    for part in states:
        band = part["stats"].result()
        dist = nodata_distribution(part)
        lai_pct = dist[0]["percentage"]
        variables.append({
            "name": part["name"], "type": "Raster", "date": part["date"],
            "width": part["cols"], "height": part["rows"],
            "bands": [{"name": "LAI", **band,
                       "no_data_distribution": dist}],
        })
        imgs.append({"raster": part["name"], "date": part["date"],
                     "percentage": lai_pct})
        lai_pcts.append(lai_pct)
        combined.merge(part["stats"])
        for label, cnt in part["nodata"].items():
            pooled_nodata[label] += cnt
        pooled_zeros += part["zeros"]
        total_px += part["n_px"]

    comb = combined.result()
    lai_dist = BandStats()
    lai_dist.update(np.asarray(lai_pcts, dtype=np.float64))
    n_imgs = len(states)
    pooled_dist = ([{"value": "LAI",
                     "percentage": 100.0 * comb.get("count", 0) / total_px}]
                   + [{"value": label,
                       "percentage": 100.0 * cnt / total_px}
                      for label, cnt in pooled_nodata.items()]
                   + [{"value": "zeros",
                       "percentage": 100.0 * pooled_zeros / total_px}]
                   ) if total_px else []
    return {
        "analysis": {"title": "Profiling Report"},
        "table": {
            "profiler_type": "Vista_Raster",
            "n_of_imgs": n_imgs,
            "avg_width": (float(np.mean([v["width"] for v in variables]))
                          if variables else 0.0),
            "avg_height": (float(np.mean([v["height"] for v in variables]))
                           if variables else 0.0),
            "combined_bands": [{
                "name": "LAI",
                "n_of_imgs": n_imgs,
                "img_names": [v["name"] for v in variables],
                "imgs": imgs,
                "count": comb.get("count", 0),
                "min": comb.get("min"), "max": comb.get("max"),
                "average": comb.get("average"),
                "variance": comb.get("variance"),   # Chan-exact pooled
                "no_data_distribution": pooled_dist,
                "lai_distribution": {"name": "LAI", **lai_dist.result()},
            }],
        },
        "variables": variables,
    }
