"""WKT geometry profiling: parser vs hand-computed values, mergeable
accumulator equivalence (split vs whole), convex hull, and the profile
integration via ProfileConfig.geometry_columns (SURVEY §2 geometry family,
reference variables/geometry.py:89-140)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from data_profiler_ray.functions.geometry import (convex_hull,
                                                  geometry_stats, hull_wkt,
                                                  parse_wkt, sample_points,
                                                  wkt_stats_batch)
from data_profiler_ray.state.column import GeometryAccumulator


def test_point_line_stats():
    p = geometry_stats("POINT (3 4)")
    assert (p["geom_type"], p["cx"], p["cy"], p["area"], p["length"]) == \
        ("Point", 3.0, 4.0, 0.0, 0.0)
    l = geometry_stats("LINESTRING (0 0, 3 4, 3 8)")
    assert l["length"] == 9.0
    # length-weighted centroid: ((1.5,2)*5 + (3,6)*4) / 9
    assert l["cx"] == pytest.approx(2.5 * 5 / 9 + 3 * 4 / 9 - 1 * 5 / 9 + 0)
    assert l["cx"] == pytest.approx((1.5 * 5 + 3 * 4) / 9)
    assert l["cy"] == pytest.approx((2 * 5 + 6 * 4) / 9)


def test_polygon_with_hole_and_multipolygon():
    g = geometry_stats(
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))")
    assert g["area"] == 15.0            # 16 exterior − 1 hole
    assert g["length"] == 20.0          # 16 + 4 ring perimeters
    # centroid: (16·(2,2) − 1·(1.5,1.5)) / 15
    assert g["cx"] == pytest.approx((16 * 2 - 1.5) / 15)
    m = geometry_stats("MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), "
                       "((10 0, 12 0, 12 2, 10 2, 10 0)))")
    assert m["area"] == 8.0 and m["cx"] == 6.0 and m["cy"] == 1.0
    assert (m["xmin"], m["xmax"]) == (0.0, 12.0)


def test_orientation_and_open_rings():
    # clockwise exterior and an unclosed ring give the same magnitudes
    cw = geometry_stats("POLYGON ((0 0, 0 4, 4 4, 4 0, 0 0))")
    open_ring = geometry_stats("POLYGON ((0 0, 4 0, 4 4, 0 4))")
    assert cw["area"] == open_ring["area"] == 16.0
    assert cw["length"] == open_ring["length"] == 16.0


def test_malformed_and_unsupported_wkt():
    for bad in ("POINT Z (1 2 3)", "GEOMETRYCOLLECTION (POINT (1 2))",
                "POLYGON ((0 0, 1 0", "CIRCLE (0 0, 5)", "POINT (1 2 3)",
                "POINT (1 2) junk"):
        with pytest.raises(ValueError):
            geometry_stats(bad)
    t, parts = parse_wkt("MULTIPOINT (1 2, 3 4)")
    assert t == "MultiPoint" and len(parts) == 2
    assert geometry_stats("LINESTRING EMPTY")["n_points"] == 0


def test_convex_hull_known():
    pts = np.array([[0, 0], [4, 0], [4, 4], [0, 4],
                    [2, 2], [1, 3], [3, 1], [0, 0]])
    h = convex_hull(pts)
    assert sorted(map(tuple, h)) == [(0, 0), (0, 4), (4, 0), (4, 4)]
    assert hull_wkt(np.array([[1, 1]])) == "POINT (1 1)"
    assert hull_wkt(np.array([[0, 0], [1, 1], [2, 2]])).startswith(
        "LINESTRING")  # collinear


def test_sample_points_bounded():
    big = "LINESTRING (" + ", ".join(f"{i} {i % 7}" for i in range(100)) + ")"
    s = sample_points(big, num_points=10)
    assert s.shape == (10, 2)
    assert tuple(s[0]) == (0, 0) and s[-1][0] == 99


def test_accumulator_split_merge_equals_whole():
    wkts = (["POINT (%d %d)" % (i, i % 5) for i in range(40)]
            + ["POLYGON ((%d 0, %d 0, %d 3, %d 3, %d 0))"
               % (i, i + 2, i + 2, i, i) for i in range(30)]
            + ["LINESTRING (0 %d, 5 %d)" % (i, i) for i in range(20)]
            + [None, "NOT WKT AT ALL", "POINT (1 2 3)"])
    arr = pa.array(wkts, pa.string())
    whole = GeometryAccumulator("g")
    whole.update(arr)
    parts = [GeometryAccumulator("g") for _ in range(3)]
    for i, acc in enumerate(parts):
        acc.update(arr.slice(i * 31, 31))
    merged = parts[0]
    merged.merge(parts[1])
    merged.merge(parts[2])
    rw, rm = whole.result(), merged.result()
    for k in ("mbr", "union_convex_hull", "geom_type_distribution",
              "n_invalid_wkt", "num_missing"):
        assert rw[k] == rm[k], k
    for k in ("area_distribution", "length_distribution"):
        for s in ("count", "min", "max", "mean"):
            assert rw[k][s] == pytest.approx(rm[k][s]), (k, s)
    # centroid within FP of each other (different merge association)
    cw = [float(v) for v in rw["centroid"][7:-1].split()]
    cm = [float(v) for v in rm["centroid"][7:-1].split()]
    assert cw == pytest.approx(cm)
    assert rw["n_invalid_wkt"] == 2
    assert {d["type"]: d["count"] for d in rw["geom_type_distribution"]} == \
        {"Point": 40, "Polygon": 30, "LineString": 20}


def test_hull_buffer_collapse_stays_exact():
    rng = np.random.default_rng(2023)
    pts = rng.normal(size=(20_000, 2))
    acc = GeometryAccumulator("g")
    # feed as many tiny point batches: buffer must collapse via hull-of-hull
    wkts = ["POINT (%r %r)" % (x, y) for x, y in pts]
    for i in range(0, len(wkts), 3000):
        acc.update(pa.array(wkts[i:i + 3000]))
    assert acc.hull_pts.shape[0] <= 4096
    direct = convex_hull(pts)
    got = convex_hull(acc.hull_pts)
    assert sorted(map(tuple, got)) == pytest.approx(
        sorted(map(tuple, direct)))


def test_profile_dataset_geometry_column():
    from data_profiler_ray.config import ProfileConfig
    from data_profiler_ray.stages.profile import profile_dataset
    wkts = ["POINT (%d %d)" % (i % 10, i % 7) if i % 2 == 0
            else "POLYGON ((0 0, %d 0, %d %d, 0 %d, 0 0))"
            % (1 + i % 4, 1 + i % 4, 2, 2) for i in range(2000)]
    tbl = pa.table({"id": pa.array(range(2000)), "geom": pa.array(wkts)})
    ds = ray.data.from_arrow(tbl).repartition(8)
    prof = profile_dataset(ds, ProfileConfig(geometry_columns=["geom"]))
    var = {v["name"]: v for v in prof["variables"]}["geom"]
    assert var["type"] == "Geometry"
    assert var["crs"] == "EPSG:4326"
    assert var["mbr"].startswith("POLYGON ((0 0")
    assert var["union_convex_hull"].startswith("POLYGON")
    dist = {d["type"]: d["count"] for d in var["geom_type_distribution"]}
    assert dist == {"Point": 1000, "Polygon": 1000}
    # polygon areas are (1+i%4)*2 ∈ {2,4,6,8}; points are 0
    assert var["area_distribution"]["max"] == 8.0
    assert var["area_distribution"]["min"] == 0.0
    # auto-detection parity: an undeclared WKT string column still gets the
    # Geometry logical type from the find_types probe chain
    prof2 = profile_dataset(ray.data.from_arrow(tbl), ProfileConfig())
    var2 = {v["name"]: v for v in prof2["variables"]}["geom"]
    assert var2["type"] == "Geometry"


def test_wkt_stats_batch_null_and_malformed_rows():
    b = pa.table({"wkt": pa.array(["POINT (1 2)", None, "garbage"])})
    out = wkt_stats_batch(b, "wkt")
    assert out.num_rows == 3
    assert out.column("geom_type").to_pylist() == ["Point", None, None]
