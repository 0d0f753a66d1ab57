"""VISTA raster (.rhd/.ras) reader + mergeable band statistics.

Lifts the raster family out of out-of-scope (SURVEY.md S7/S8/A19/A22;
VERDICT r4 "What's missing" item 6). The reference reads generic rasters
through rasterio (not available here) but its VISTA path is plain
numpy over a documented binary layout — a text ``.rhd`` sidecar header
plus an int16 ``.ras`` blob — which this module re-implements from the
observed format (reference behaviour at
``/root/reference/stelardataprofiler/raster/profiler.py:512-555`` header
parse, ``:590-642`` int16 decode + LAI ``x/1000`` for positives,
``:709-806`` per-image band stats over positive pixels + NODATA sentinel
distribution, ``:800-880`` cross-image combined stats).

Scale notes (100-TB posture):

- one table ROW per image (``image_id, name, date, rows, cols,
  payload``), so a multi-thousand-image archive fans out across the
  cluster as ordinary Arrow blocks; payloads never enter a shuffle.
- band statistics fold into ``BandStats`` — Chan-merged moments + a KLL
  sketch — so per-image partials are fixed-size and the cross-image
  combine is exact and associative. The reference's pooled-variance
  merge uses ``std`` where ``var`` belongs (``profiler.py:864`` —
  SURVEY A19 flags it); we do NOT replicate the bug: combined variance
  here equals the ddof-1 variance of the union of valid pixels.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import date as _date

import numpy as np

from ..state.kll import KLLSketch
from ..state.moments import MomentsState

# NODATA sentinel codes (reference raster/profiler.py:739-749)
NODATA_LABELS: dict[int, str] = {
    -999: "missing", -961: "forest", -950: "urban", -940: "water",
    -930: "snow", -923: "cloud_shadow_buffer", -920: "cloud_shadow",
    -913: "cloud_buffer", -911: "cirrus_clouds", -910: "clouds",
}

VISTA_LAI_TYPE = 7  # vista_data_type with the x/1000 positive-pixel decode


def parse_rhd(text: str) -> dict:
    """Parse a VISTA ``.rhd`` sidecar header.

    Layout (reference ``__read_image_rhd``): line0 = vista_data_type,
    line1 = number of images, line2 = ``columns rows``, line3 =
    ``resolution ulx uly utm_x utm_y utm_zone``, lines 4.. one per image:
    ``bytes_per_px year month day``. Raises ValueError on malformed input.
    """
    try:
        lines = [ln for ln in text.splitlines()]
        vista_data_type = int(lines[0])
        n_images = int(lines[1])
        cols_s, rows_s = lines[2].split()[:2]
        columns, rows = int(cols_s), int(rows_s)
        r4 = lines[3].split()
        resolution = float(r4[0])
        ulx, uly = float(r4[1]), float(r4[2])
        utm_x, utm_y, utm_zone = float(r4[3]), float(r4[4]), r4[5]
        images = []
        start_px = 0
        for i in range(n_images):
            row = lines[4 + i].split()
            img_bytes = int(row[0])
            year, month, day = int(row[1]), int(row[2]), int(row[3])
            images.append({
                "index": i,
                "bytes": img_bytes,
                "date": _date(year, month, day).isoformat(),
                "start_px": start_px,
                "n_px": rows * columns,
            })
            start_px += rows * columns
    except (IndexError, ValueError) as ex:
        if isinstance(ex, ValueError) and str(ex).startswith("vista"):
            raise
        raise ValueError(f"vista: malformed rhd header ({ex!r})") from ex
    return {
        "vista_data_type": vista_data_type, "n_images": n_images,
        "rows": rows, "columns": columns, "resolution": resolution,
        "upper_left_corner_x": ulx, "upper_left_corner_y": uly,
        "UTM_x": utm_x, "UTM_y": utm_y, "UTM_zone": utm_zone,
        "images": images,
    }


def decode_vista(payload: bytes, rhd: dict) -> list[np.ndarray]:
    """Decode a ``.ras`` blob into per-image float arrays (rows×cols).

    int16 little-endian pixels; for the LAI data type, positive pixels
    are scaled ``x/1000`` (reference ``__lai_f``), negatives are NODATA
    sentinels kept verbatim.
    """
    arr = np.frombuffer(payload, dtype="<i2").astype(np.float64)
    rows, cols, n = rhd["rows"], rhd["columns"], rhd["n_images"]
    if arr.size != rows * cols * n:
        raise ValueError(
            f"vista: ras has {arr.size} px, header promises "
            f"{rows * cols * n}")
    if rhd["vista_data_type"] == VISTA_LAI_TYPE:
        pos = arr > 0
        arr[pos] = arr[pos] / 1000.0
    return [arr[i["start_px"]:i["start_px"] + i["n_px"]]
            .reshape(rows, cols) for i in rhd["images"]]


def decode_vista_image(payload: bytes, rows: int, cols: int,
                       lai: bool = True) -> np.ndarray:
    """Decode ONE image slice (the per-row table layout)."""
    arr = np.frombuffer(payload, dtype="<i2").astype(np.float64)
    if arr.size != rows * cols:
        raise ValueError(f"vista: image has {arr.size} px, want "
                         f"{rows * cols}")
    if lai:
        pos = arr > 0
        arr[pos] = arr[pos] / 1000.0
    return arr.reshape(rows, cols)


@dataclass
class BandStats:
    """Mergeable band statistics: Chan moments + KLL quantiles.

    ``result()`` carries the reference band_dict keys
    (``profiler.py:715-732``): count/min/max/average/stddev/median/
    kurtosis/skewness/variance/percentile10/25/75/90 — pandas-describe
    semantics (ddof-1 std/var, Fisher kurtosis, N−1 skew), supplied by
    ``MomentsState`` exactly and by the KLL sketch for percentiles.
    """

    mom: MomentsState = field(default_factory=MomentsState)
    kll: KLLSketch = field(default_factory=KLLSketch)

    def update(self, values: np.ndarray) -> None:
        self.mom.update(values)
        self.kll.update(np.asarray(values, dtype=np.float64))

    def merge(self, other: "BandStats") -> None:
        self.mom.merge(other.mom)
        self.kll.merge(other.kll)

    def result(self) -> dict:
        r = self.mom.result()
        if not r["count"]:
            return {"count": 0}
        q = self.kll.quantile([0.10, 0.25, 0.5, 0.75, 0.90])
        return {
            "count": r["count"], "min": r["min"], "max": r["max"],
            "average": r["mean"], "stddev": r["std"],
            "median": float(q[2]), "kurtosis": r["kurtosis"],
            "skewness": r["skewness"], "variance": r["variance"],
            "percentile10": float(q[0]), "percentile25": float(q[1]),
            "percentile75": float(q[3]), "percentile90": float(q[4]),
        }


def image_band_partial(img: np.ndarray) -> dict:
    """Per-image partial: LAI band stats over POSITIVE pixels
    (reference ``profiler.py:710``), NODATA sentinel counts, zero count."""
    flat = img.ravel()
    stats = BandStats()
    stats.update(flat[flat > 0])
    neg = flat[flat < 0].astype(np.int64)
    nodata = {label: int(np.count_nonzero(neg == code))
              for code, label in NODATA_LABELS.items()}
    return {
        "stats": stats,
        "nodata": nodata,
        "zeros": int(np.count_nonzero(flat == 0.0)),
        "n_px": int(flat.size),
    }


def nodata_distribution(partial: dict) -> list[dict]:
    """Percentage rows per sentinel label (+ LAI valid %, + zeros),
    matching the reference no_data_dict shape (``profiler.py:768-781``)."""
    n_px = partial["n_px"]
    rows = [{"value": "LAI",
             "percentage": 100.0 * partial["stats"].mom.n / n_px}]
    rows += [{"value": label, "percentage": 100.0 * cnt / n_px}
             for label, cnt in partial["nodata"].items()]
    rows.append({"value": "zeros",
                 "percentage": 100.0 * partial["zeros"] / n_px})
    return rows


# ---------------------------------------------------------------------------
# Deterministic synthetic VISTA builder (tests + demo pipelines; the brief
# forbids external data — this stands in for real VISTA archives).
# ---------------------------------------------------------------------------

def build_vista(n_images: int = 4, rows: int = 32, cols: int = 48,
                seed: int = 2023, start: tuple[int, int, int] = (2021, 3, 1)
                ) -> tuple[str, bytes]:
    """Build a spec-shaped ``(rhd_text, ras_bytes)`` pair: LAI fields with
    planted NODATA sentinels, zeros, and positive values stored ×1000."""
    rng = np.random.default_rng(seed)
    codes = np.array(list(NODATA_LABELS), dtype=np.int16)
    imgs = []
    header = [str(VISTA_LAI_TYPE), str(n_images), f"{cols} {rows}",
              f"10.0 500000.0 4600000.0 500000.0 4600000.0 34N"]
    y0, m0, d0 = start
    for i in range(n_images):
        lai = rng.uniform(0.05, 6.5, size=rows * cols)
        px = np.round(lai * 1000).astype(np.int16)
        # plant sentinels on ~20% of pixels, zeros on ~5%
        mask = rng.random(rows * cols)
        sent = mask < 0.20
        px[sent] = codes[rng.integers(0, codes.size, int(sent.sum()))]
        px[(mask >= 0.20) & (mask < 0.25)] = 0
        imgs.append(px)
        header.append(f"2 {y0} {m0} {min(d0 + i, 28)}")
    rhd = "\n".join(header) + "\n"
    ras = b"".join(p.astype("<i2").tobytes() for p in imgs)
    return rhd, ras
