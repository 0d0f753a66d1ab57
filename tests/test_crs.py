"""UTM ↔ WGS84 reprojection tests (closes the r5 geometry CRS gap).

The Krüger-series transform is validated by mathematical identities
rather than memorized coordinates: the central meridian maps to the
500 km false easting with scale exactly k0 = 0.9996, forward∘inverse is
the identity to sub-millimetre across the zone and both hemispheres,
and the meridian-arc northing at the equator is 0.
"""

import numpy as np
import pyarrow as pa
import pytest

from data_profiler_ray.functions.crs import (reproject_to_wgs84,
                                             utm_to_wgs84, utm_zone_of,
                                             wgs84_to_utm)


def test_central_meridian_identities():
    e, n = wgs84_to_utm(3.0, 0.0, 31)          # zone 31 CM = 3°E
    assert float(e) == pytest.approx(500_000.0, abs=1e-6)
    assert float(n) == pytest.approx(0.0, abs=1e-6)
    # scale factor along the CM is k0: dN/d(arc) with the WGS84 meridian
    # radius at the equator M = a(1-e²)
    _, n2 = wgs84_to_utm(3.0, 0.001, 31)
    m_eq = 6378137.0 * (1 - 0.00669437999014)
    assert float(n2) / (np.deg2rad(0.001) * m_eq) == pytest.approx(
        0.9996, abs=1e-7)


def test_roundtrip_submillimetre():
    rng = np.random.default_rng(7)
    lon = rng.uniform(0.2, 5.8, 4000)           # zone 31 spans 0-6°E
    lat = rng.uniform(-80.0, 84.0, 4000)
    e, n = wgs84_to_utm(lon, lat, 31)
    lon2, lat2 = utm_to_wgs84(e, n, 31)
    assert np.abs(lon2 - lon).max() < 1e-8      # ≈ 1 mm at the equator
    assert np.abs(lat2 - lat).max() < 1e-8


def test_southern_hemisphere_false_northing():
    e, n = wgs84_to_utm(3.0, -30.0, 31, northern=False)
    assert 0 < float(n) < 10_000_000            # false northing applied
    lon, lat = utm_to_wgs84(e, n, 31, northern=False)
    assert float(lat) == pytest.approx(-30.0, abs=1e-8)
    assert float(lon) == pytest.approx(3.0, abs=1e-8)


def test_zone_inference():
    assert utm_zone_of(3.0, 48.0) == (31, True)       # Paris-ish
    assert utm_zone_of(-77.0, -12.0) == (18, False)   # Lima
    assert utm_zone_of(-179.9, 10.0) == (1, True)
    assert utm_zone_of(179.9, 10.0) == (60, True)


def test_reproject_crs_strings():
    lon, lat = reproject_to_wgs84([500_000.0], [0.0], "EPSG:32631")
    assert float(lon[0]) == pytest.approx(3.0)
    assert float(lat[0]) == pytest.approx(0.0, abs=1e-9)
    # 4326 passthrough
    x, y = reproject_to_wgs84([12.5], [41.9], "EPSG:4326")
    assert float(x[0]) == 12.5 and float(y[0]) == 41.9
    for bad in ("EPSG:3857", "EPSG:32700", "utm", "EPSG:32661"):
        with pytest.raises(ValueError):
            reproject_to_wgs84([0.0], [0.0], bad)


def test_geometry_accumulator_reprojects_utm():
    """A UTM-coordinate WKT column profiled with crs='EPSG:32631' must
    report its bbox/centroid in lon/lat, matching a direct transform of
    the same vertices."""
    from data_profiler_ray.state.column import GeometryAccumulator

    lon = np.array([2.2, 2.8, 3.4, 4.0])
    lat = np.array([41.0, 42.0, 43.0, 44.0])
    e, n = wgs84_to_utm(lon, lat, 31)
    wkts = [f"POINT ({x:.6f} {y:.6f})" for x, y in zip(e, n)]
    acc = GeometryAccumulator("g", crs="EPSG:32631")
    acc.update(pa.array(wkts, pa.string()))
    out = acc.result()
    assert out["n_invalid_wkt"] == 0
    # mbr in degrees, within rounding of the planted lon/lat
    import re
    nums = [float(v) for v in re.findall(r"-?\d+(?:\.\d+)?", out["mbr"])]
    xs, ys = nums[0::2], nums[1::2]
    assert min(xs) == pytest.approx(2.2, abs=1e-4)
    assert max(xs) == pytest.approx(4.0, abs=1e-4)
    assert min(ys) == pytest.approx(41.0, abs=1e-4)
    assert max(ys) == pytest.approx(44.0, abs=1e-4)
    cx, cy = [float(v) for v in
              re.findall(r"-?\d+(?:\.\d+)?", out["centroid"])]
    assert cx == pytest.approx(3.1, abs=1e-4)
    assert cy == pytest.approx(42.5, abs=1e-4)
    assert out["crs"] == "EPSG:32631"
