"""Shapefile (.shp/.dbf) reader tests (closes SURVEY S2).

Round-trips synthetic spec-valid files through the reader and on into
the existing WKT geometry profile path — the reference's
shapefile→WKT-column behaviour (variables/utils.py:64-70) without
geopandas.
"""

import numpy as np
import pyarrow as pa
import pytest

from data_profiler_ray.functions.geometry import geometry_stats
from data_profiler_ray.functions.shapefile import (build_dbf, build_shp,
                                                   read_dbf, read_shp,
                                                   shapefile_to_table)

# ESRI winding: exteriors clockwise (negative shoelace), holes CCW
EXT = [(0, 0), (0, 4), (4, 4), (4, 0), (0, 0)]
HOLE = [(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)]
EXT2 = [(10, 10), (10, 12), (12, 12), (12, 10), (10, 10)]

GEOMS = [
    ("point", (2.5, 3.5)),
    ("polyline", [[(0, 0), (1, 1), (2, 0)]]),
    ("polyline", [[(0, 0), (1, 0)], [(5, 5), (6, 6)]]),
    ("polygon", [EXT, HOLE]),
    ("polygon", [EXT, HOLE, EXT2]),       # 2 exteriors → MULTIPOLYGON
    ("multipoint", [(0, 0), (5, 5)]),
    ("null",),
]


@pytest.fixture(scope="module")
def shp_bytes():
    return build_shp(GEOMS)


def test_shp_roundtrip_wkt(shp_bytes):
    wkts = read_shp(shp_bytes)
    assert wkts[0] == "POINT (2.5 3.5)"
    assert wkts[1] == "LINESTRING (0 0, 1 1, 2 0)"
    assert wkts[2].startswith("MULTILINESTRING (")
    assert wkts[3].startswith("POLYGON (")
    assert wkts[4].startswith("MULTIPOLYGON (")
    assert wkts[5] == "MULTIPOINT ((0 0), (5 5))"
    assert wkts[6] is None


def test_shp_geometry_semantics(shp_bytes):
    wkts = read_shp(shp_bytes)
    st = geometry_stats(wkts[3])
    assert st["area"] == pytest.approx(16.0 - 1.0)   # hole subtracted
    st2 = geometry_stats(wkts[4])
    assert st2["geom_type"] == "MultiPolygon"
    assert st2["area"] == pytest.approx(15.0 + 4.0)


def test_shp_malformed():
    good = build_shp([("point", (1.0, 2.0))])
    for bad in (b"", good[:50], b"\x00" * 120,
                good[:24] + good[24:].replace(b"\xe8\x03", b"\x07\x00", 1)):
        with pytest.raises(ValueError):
            read_shp(bad)


def test_dbf_types():
    dbf = build_dbf({
        "name": ["alpha", "beta", None],
        "count": [10, 20, 30],
        "score": [1.5, 2.25, None],
    })
    tbl = read_dbf(dbf)
    assert tbl.column("name").to_pylist() == ["alpha", "beta", None]
    assert tbl.column("count").to_pylist() == [10, 20, 30]
    assert tbl.column("score").to_pylist()[:2] == [1.5, 2.25]
    assert tbl.column("score").to_pylist()[2] is None


def test_shapefile_to_table_joint(shp_bytes):
    names = [f"g{i}" for i in range(len(GEOMS))]
    dbf = build_dbf({"name": names, "idx": list(range(len(GEOMS)))})
    tbl = shapefile_to_table(shp_bytes, dbf)
    assert tbl.schema.names == ["name", "idx", "geometry"]
    assert tbl.num_rows == len(GEOMS)
    # row-count mismatch raises
    with pytest.raises(ValueError):
        shapefile_to_table(shp_bytes, build_dbf({"name": ["one"],
                                                 "idx": [0]}))


def test_shapefile_feeds_geometry_profile(shp_bytes):
    """The reader's WKT column drives the existing geometry accumulator —
    the reference's shapefile→profile path end to end."""
    from data_profiler_ray.state.column import GeometryAccumulator

    tbl = shapefile_to_table(shp_bytes)
    acc = GeometryAccumulator("geometry")
    acc.update(tbl.column("geometry").combine_chunks())
    out = acc.result()
    assert out["n_invalid_wkt"] == 0
    dist = {d["type"]: d["count"]
            for d in out["geom_type_distribution"]}
    assert dist == {"Point": 1, "LineString": 1, "MultiLineString": 1,
                    "Polygon": 1, "MultiPolygon": 1, "MultiPoint": 1}
    assert out["num_missing"] == 1        # the Null shape
