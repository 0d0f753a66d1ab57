"""VISTA raster reader + band-stat tests (lifts SURVEY S8/A19/A22).

Oracles are pandas/numpy with the exact reference semantics: band stats
are ``pd.Series(img[img > 0]).describe(percentiles=[.1,.25,.75,.9])`` +
kurtosis/skew/var (raster/profiler.py:710-732), NODATA percentages are
sentinel counts over w×h (:739-781), and the combined variance must be
the EXACT ddof-1 variance of the union of valid pixels — deliberately
NOT the reference's std-for-var merge slip (:864; SURVEY A19).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from data_profiler_ray.functions.raster import (BandStats, build_vista,
                                                decode_vista,
                                                image_band_partial,
                                                nodata_distribution,
                                                parse_rhd, NODATA_LABELS)
from data_profiler_ray.pipelines.raster import (profile_raster_dataset,
                                                vista_to_table)


@pytest.fixture(scope="module")
def vista():
    rhd, ras = build_vista(n_images=5, rows=40, cols=52, seed=11)
    return rhd, ras, parse_rhd(rhd)


def test_rhd_parse_roundtrip(vista):
    rhd_text, ras, rhd = vista
    assert rhd["vista_data_type"] == 7
    assert rhd["n_images"] == 5
    assert (rhd["rows"], rhd["columns"]) == (40, 52)
    assert rhd["UTM_zone"] == "34N"
    assert [i["date"] for i in rhd["images"]] == [
        f"2021-03-0{d}" for d in range(1, 6)]
    assert rhd["images"][3]["start_px"] == 3 * 40 * 52


def test_rhd_malformed():
    for bad in ["", "7\n", "x\n3\n4 4\n1 0 0 0 0 34N\n",
                "7\n2\n4 4\n1 0 0 0 0 34N\n2 2021 3 1\n"]:
        with pytest.raises(ValueError):
            parse_rhd(bad)


def test_decode_lai_scaling(vista):
    rhd_text, ras, rhd = vista
    imgs = decode_vista(ras, rhd)
    assert len(imgs) == 5
    for img in imgs:
        assert img.shape == (40, 52)
        pos = img[img > 0]
        assert pos.size and pos.max() <= 7.0       # /1000 applied
        neg = np.unique(img[img < 0]).astype(int)
        assert set(neg) <= set(NODATA_LABELS)      # sentinels verbatim


def test_band_stats_match_pandas_describe(vista):
    rhd_text, ras, rhd = vista
    img = decode_vista(ras, rhd)[2]
    part = image_band_partial(img)
    got = part["stats"].result()
    s = pd.Series(img.ravel()[img.ravel() > 0])
    stats = s.describe(percentiles=[.10, .25, .75, .90])
    assert got["count"] == stats["count"]
    assert got["min"] == pytest.approx(stats["min"])
    assert got["max"] == pytest.approx(stats["max"])
    assert got["average"] == pytest.approx(stats["mean"])
    assert got["stddev"] == pytest.approx(s.std())
    assert got["variance"] == pytest.approx(s.var())
    assert got["kurtosis"] == pytest.approx(s.kurtosis())
    assert got["skewness"] == pytest.approx(s.skew())
    # KLL percentiles: small data → sketch is exact-ish; allow 2% of range
    rng = stats["max"] - stats["min"]
    for key, q in (("percentile10", "10%"), ("percentile25", "25%"),
                   ("median", "50%"), ("percentile75", "75%"),
                   ("percentile90", "90%")):
        assert abs(got[key] - stats[q]) <= 0.02 * rng


def test_nodata_distribution_counts(vista):
    rhd_text, ras, rhd = vista
    img = decode_vista(ras, rhd)[0]
    dist = {d["value"]: d["percentage"]
            for d in nodata_distribution(image_band_partial(img))}
    flat = img.ravel()
    n_px = flat.size
    for code, label in NODATA_LABELS.items():
        want = 100.0 * np.count_nonzero(flat == code) / n_px
        assert dist[label] == pytest.approx(want)
    assert dist["zeros"] == pytest.approx(
        100.0 * np.count_nonzero(flat == 0) / n_px)
    assert dist["LAI"] == pytest.approx(
        100.0 * np.count_nonzero(flat > 0) / n_px)
    assert sum(dist.values()) == pytest.approx(100.0)


def test_combined_variance_is_exact_not_reference_bug(vista):
    """Chan merge of per-image states == ddof-1 variance of the pixel
    union; the reference's count*std+count*d² formula is NOT replicated."""
    rhd_text, ras, rhd = vista
    imgs = decode_vista(ras, rhd)
    merged = BandStats()
    for img in imgs:
        merged.merge(image_band_partial(img)["stats"])
    got = merged.result()
    allpos = np.concatenate([im.ravel()[im.ravel() > 0] for im in imgs])
    assert got["count"] == allpos.size
    assert got["average"] == pytest.approx(allpos.mean())
    assert got["variance"] == pytest.approx(allpos.var(ddof=1))
    assert got["min"] == pytest.approx(allpos.min())
    assert got["max"] == pytest.approx(allpos.max())


def test_profile_raster_dataset_e2e(ray_session, vista):
    rhd_text, ras, rhd = vista
    tbl = vista_to_table(rhd_text, ras, name="t")
    prof = profile_raster_dataset(ray.data.from_arrow(tbl))
    assert prof["table"]["n_of_imgs"] == 5
    assert prof["table"]["avg_width"] == 52.0
    assert prof["table"]["avg_height"] == 40.0
    assert len(prof["variables"]) == 5
    assert prof["variables"][0]["name"] == "t_0"
    comb = prof["table"]["combined_bands"][0]
    imgs = decode_vista(ras, rhd)
    allpos = np.concatenate([im.ravel()[im.ravel() > 0] for im in imgs])
    assert comb["count"] == allpos.size
    assert comb["average"] == pytest.approx(allpos.mean())
    assert comb["variance"] == pytest.approx(allpos.var(ddof=1))
    assert comb["lai_distribution"]["count"] == 5
    # per-image band block matches a direct partial of the same image
    v2 = prof["variables"][2]["bands"][0]
    direct = image_band_partial(imgs[2])["stats"].result()
    assert v2["count"] == direct["count"]
    assert v2["average"] == pytest.approx(direct["average"])
    # pooled NODATA percentages sum to 100
    pooled = {d["value"]: d["percentage"]
              for d in comb["no_data_distribution"]}
    assert sum(pooled.values()) == pytest.approx(100.0)
