"""ESRI Shapefile (.shp + .dbf) reader → Arrow table with WKT geometry.

Closes SURVEY S2 (the last non-GeoTIFF coverage gap): the reference
reads shapefiles through geopandas and converts geometry to WKT string
columns (``/root/reference/stelardataprofiler/tabular_timeseries/
variables/utils.py:64-70``). geopandas/GDAL are not available here, but
both formats are public specifications:

- **.shp** — "ESRI Shapefile Technical Description" (ESRI whitepaper,
  July 1998): 100-byte mixed-endian header, then records of
  ``(record#  BE, content-length BE, shape-type LE, geometry doubles)``.
  Implemented shape types: Null (0), Point (1), PolyLine (3),
  Polygon (5), MultiPoint (8). Z/M variants raise (documented gap).
- **.dbf** — dBASE III/IV level: fixed-width ASCII records behind a
  32-byte-per-field descriptor table. Field types C (char), N/F
  (numeric), L (logical), D (date) are decoded; others pass through as
  strings.

Polygon ring → WKT semantics per the spec: exterior rings wind
CLOCKWISE, holes COUNTER-clockwise; each CW ring opens a new polygon
and the CCW rings that follow are its holes (multiple exteriors →
MULTIPOLYGON). The emitted WKT feeds the existing geometry profile path
(``functions/geometry.py`` / ``GeometryAccumulator``) unchanged —
exactly the reference's shapefile→WKT-column behaviour.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

SHAPE_NULL, SHAPE_POINT, SHAPE_POLYLINE = 0, 1, 3
SHAPE_POLYGON, SHAPE_MULTIPOINT = 5, 8
_SUPPORTED = {SHAPE_NULL, SHAPE_POINT, SHAPE_POLYLINE, SHAPE_POLYGON,
              SHAPE_MULTIPOINT}


def _ring_cw(c: np.ndarray) -> bool:
    """Shoelace: negative signed area = clockwise (ESRI exterior)."""
    x, y = c[:, 0], c[:, 1]
    return float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) < 0


def _fmt(v: float) -> str:
    return f"{v:.10g}"


def _ring_wkt(c: np.ndarray) -> str:
    return "(" + ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in c) + ")"


def _polygon_wkt(rings: list[np.ndarray]) -> str:
    """Group CW exteriors with their trailing CCW holes (spec winding)."""
    polys: list[list[np.ndarray]] = []
    for r in rings:
        if _ring_cw(r) or not polys:
            polys.append([r])
        else:
            polys[-1].append(r)
    if len(polys) == 1:
        return "POLYGON (" + ", ".join(_ring_wkt(r) for r in polys[0]) + ")"
    return ("MULTIPOLYGON ("
            + ", ".join("(" + ", ".join(_ring_wkt(r) for r in p) + ")"
                        for p in polys) + ")")


def read_shp(payload: bytes) -> list[str | None]:
    """Parse a ``.shp`` main file into per-record WKT strings (None for
    Null shapes). Raises ValueError('shp: ...') on malformed input."""
    try:
        return _read_shp(payload)
    except ValueError:
        raise
    except Exception as ex:
        raise ValueError(f"shp: malformed payload ({ex!r})") from ex


def _read_shp(payload: bytes) -> list[str | None]:
    if len(payload) < 100:
        raise ValueError("shp: truncated header")
    code = struct.unpack(">i", payload[0:4])[0]
    if code != 9994:
        raise ValueError(f"shp: bad file code {code}")
    file_words = struct.unpack(">i", payload[24:28])[0]
    version, global_type = struct.unpack("<ii", payload[28:36])
    if version != 1000:
        raise ValueError(f"shp: unsupported version {version}")
    if global_type not in _SUPPORTED:
        raise ValueError(f"shp: unsupported shape type {global_type} "
                         "(Z/M variants are a documented gap)")
    end = min(len(payload), file_words * 2)
    out: list[str | None] = []
    pos = 100
    while pos + 8 <= end:
        _recno, clen = struct.unpack(">ii", payload[pos:pos + 8])
        body = pos + 8
        nxt = body + clen * 2
        if nxt > len(payload):
            raise ValueError("shp: record extends past file")
        stype = struct.unpack("<i", payload[body:body + 4])[0]
        p = body + 4
        if stype == SHAPE_NULL:
            out.append(None)
        elif stype == SHAPE_POINT:
            x, y = struct.unpack("<2d", payload[p:p + 16])
            out.append(f"POINT ({_fmt(x)} {_fmt(y)})")
        elif stype == SHAPE_MULTIPOINT:
            npts = struct.unpack("<i", payload[p + 32:p + 36])[0]
            pts = np.frombuffer(payload, dtype="<f8", count=2 * npts,
                                offset=p + 36).reshape(-1, 2)
            out.append("MULTIPOINT ("
                       + ", ".join(f"({_fmt(x)} {_fmt(y)})"
                                   for x, y in pts) + ")")
        elif stype in (SHAPE_POLYLINE, SHAPE_POLYGON):
            nparts, npts = struct.unpack("<2i", payload[p + 32:p + 40])
            parts = np.frombuffer(payload, dtype="<i4", count=nparts,
                                  offset=p + 40)
            pts = np.frombuffer(payload, dtype="<f8", count=2 * npts,
                                offset=p + 40 + 4 * nparts).reshape(-1, 2)
            bounds = np.append(parts, npts)
            pieces = [pts[bounds[i]:bounds[i + 1]] for i in range(nparts)]
            if stype == SHAPE_POLYLINE:
                if len(pieces) == 1:
                    out.append("LINESTRING " + _ring_wkt(pieces[0]))
                else:
                    out.append("MULTILINESTRING ("
                               + ", ".join(_ring_wkt(pc) for pc in pieces)
                               + ")")
            else:
                out.append(_polygon_wkt(pieces))
        else:
            raise ValueError(f"shp: unsupported shape type {stype}")
        pos = nxt
    return out


# --- .dbf ---------------------------------------------------------------

def read_dbf(payload: bytes) -> pa.Table:
    """Parse a dBASE III/IV ``.dbf`` attribute file into an Arrow table."""
    try:
        return _read_dbf(payload)
    except ValueError:
        raise
    except Exception as ex:
        raise ValueError(f"dbf: malformed payload ({ex!r})") from ex


def _read_dbf(payload: bytes) -> pa.Table:
    if len(payload) < 32:
        raise ValueError("dbf: truncated header")
    n_rec = struct.unpack("<I", payload[4:8])[0]
    hdr_size, rec_size = struct.unpack("<HH", payload[8:12])
    fields = []
    pos = 32
    while pos + 1 <= len(payload) and payload[pos] != 0x0D:
        if pos + 32 > len(payload):
            raise ValueError("dbf: truncated field descriptor")
        raw = payload[pos:pos + 32]
        name = raw[0:11].split(b"\x00")[0].decode("ascii",
                                                  "replace").strip()
        ftype = chr(raw[11])
        flen = raw[16]
        fdec = raw[17]
        fields.append((name, ftype, flen, fdec))
        pos += 32
    data_at = hdr_size
    cols: dict[str, list] = {name: [] for name, *_ in fields}
    for r in range(n_rec):
        base = data_at + r * rec_size
        if base + rec_size > len(payload):
            raise ValueError("dbf: record extends past file")
        if payload[base:base + 1] == b"*":      # deleted record
            continue
        off = base + 1
        for name, ftype, flen, fdec in fields:
            raw_v = payload[off:off + flen]
            off += flen
            s = raw_v.decode("ascii", "replace").strip()
            if ftype in ("N", "F"):
                if not s:
                    cols[name].append(None)
                elif fdec or ftype == "F" or "." in s:
                    cols[name].append(float(s))
                else:
                    cols[name].append(int(s))
            elif ftype == "L":
                cols[name].append(True if s in "TtYy" else
                                  False if s in "FfNn" else None)
            elif ftype == "D":
                cols[name].append(f"{s[0:4]}-{s[4:6]}-{s[6:8]}"
                                  if len(s) == 8 else None)
            else:
                cols[name].append(s if s else None)
    return pa.table(cols)


def shapefile_to_table(shp: bytes, dbf: bytes | None = None,
                       geometry_column: str = "geometry") -> pa.Table:
    """The reference's shapefile→DataFrame shape: attribute columns (from
    .dbf, when given) plus a WKT ``geometry`` string column."""
    wkts = read_shp(shp)
    geom = pa.array(wkts, pa.string())
    if dbf is None:
        return pa.table({geometry_column: geom})
    attrs = read_dbf(dbf)
    if attrs.num_rows != len(wkts):
        raise ValueError(
            f"shapefile: .dbf has {attrs.num_rows} records, .shp has "
            f"{len(wkts)}")
    return attrs.append_column(geometry_column, geom)


# --- synthetic writer (tests; no external data) ---------------------------

def _shp_record(recno: int, content: bytes) -> bytes:
    return struct.pack(">ii", recno, len(content) // 2) + content


def build_shp(geoms: list) -> bytes:
    """Build a ``.shp`` from parsed-geometry tuples:
    ``('point', (x, y))``, ``('multipoint', [(x,y),...])``,
    ``('polyline', [part, ...])``, ``('polygon', [ring, ...])``,
    ``('null',)`` — parts/rings are (k,2) float arrays/lists."""
    recs = []
    gtype = SHAPE_NULL
    allpts = []
    for i, g in enumerate(geoms, start=1):
        kind = g[0]
        if kind == "null":
            recs.append(_shp_record(i, struct.pack("<i", SHAPE_NULL)))
            continue
        if kind == "point":
            x, y = g[1]
            allpts.append((x, y))
            gtype = SHAPE_POINT
            recs.append(_shp_record(
                i, struct.pack("<i2d", SHAPE_POINT, x, y)))
            continue
        if kind == "multipoint":
            pts = np.asarray(g[1], dtype=np.float64)
            allpts.extend(map(tuple, pts))
            gtype = SHAPE_MULTIPOINT
            body = struct.pack(
                "<i4di", SHAPE_MULTIPOINT,
                pts[:, 0].min(), pts[:, 1].min(),
                pts[:, 0].max(), pts[:, 1].max(), len(pts))
            body += pts.astype("<f8").tobytes()
            recs.append(_shp_record(i, body))
            continue
        stype = SHAPE_POLYLINE if kind == "polyline" else SHAPE_POLYGON
        gtype = stype
        parts = [np.asarray(p, dtype=np.float64) for p in g[1]]
        pts = np.vstack(parts)
        allpts.extend(map(tuple, pts))
        offs = np.cumsum([0] + [len(p) for p in parts[:-1]])
        body = struct.pack(
            "<i4d2i", stype,
            pts[:, 0].min(), pts[:, 1].min(),
            pts[:, 0].max(), pts[:, 1].max(), len(parts), len(pts))
        body += np.asarray(offs, dtype="<i4").tobytes()
        body += pts.astype("<f8").tobytes()
        recs.append(_shp_record(i, body))
    content = b"".join(recs)
    total_words = (100 + len(content)) // 2
    ap = np.asarray(allpts or [(0.0, 0.0)])
    # header: 7 BE ints (file code, 5 unused, length-in-words), then LE
    # version/shape-type, then the 8-double bbox
    header = struct.pack(">7i", 9994, 0, 0, 0, 0, 0, total_words)
    header += struct.pack("<2i", 1000, gtype)
    header += struct.pack("<8d", ap[:, 0].min(), ap[:, 1].min(),
                          ap[:, 0].max(), ap[:, 1].max(), 0, 0, 0, 0)
    assert len(header) == 100
    return header + content


def build_dbf(columns: dict[str, list]) -> bytes:
    """Minimal dBASE III writer (C/N fields) for test fixtures."""
    import datetime
    names = list(columns)
    n_rec = len(next(iter(columns.values()))) if columns else 0
    fields = []
    for name in names:
        vals = columns[name]
        if all(isinstance(v, (int, float)) or v is None for v in vals):
            dec = 0 if all(isinstance(v, int) or v is None
                           for v in vals) else 6
            flen = 18
            fields.append((name, "N", flen, dec))
        else:
            flen = max([len(str(v)) for v in vals if v is not None] or [1])
            fields.append((name, "C", min(flen, 254), 0))
    rec_size = 1 + sum(f[2] for f in fields)
    hdr_size = 32 + 32 * len(fields) + 1
    out = bytearray()
    out += struct.pack("<B3BIHH", 0x03, 24, 1, 1, n_rec, hdr_size,
                       rec_size)
    out += bytes(20)
    for name, ftype, flen, fdec in fields:
        d = bytearray(32)
        d[0:11] = name.encode("ascii")[:10].ljust(11, b"\x00")
        d[11] = ord(ftype)
        d[16] = flen
        d[17] = fdec
        out += d
    out += b"\x0d"
    for r in range(n_rec):
        out += b" "
        for (name, ftype, flen, fdec) in fields:
            v = columns[name][r]
            if v is None:
                out += b" " * flen
            elif ftype == "N":
                s = (f"{v:.{fdec}f}" if fdec else str(int(v)))
                out += s.rjust(flen)[:flen].encode("ascii")
            else:
                out += str(v).ljust(flen)[:flen].encode("ascii")
    out += b"\x1a"
    return bytes(out)
