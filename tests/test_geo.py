"""Geo datum transforms: round-trip + guard properties (SURVEY §5.2)."""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from scraper_spark.functions import geo


china_lon = st.floats(min_value=80.0, max_value=125.0)
china_lat = st.floats(min_value=20.0, max_value=50.0)


@given(china_lon, china_lat)
@settings(max_examples=100, deadline=None)
def test_bd09_gcj02_roundtrip(lon, lat):
    glon, glat = geo.bd09_to_gcj02(np.array([lon]), np.array([lat]))
    blon, blat = geo.gcj02_to_bd09(glon, glat)
    # the BD-09 pair are published approximate inverses, not exact —
    # residual ~1e-6 deg (≈0.1 m), same as the reference's behavior
    assert abs(blon[0] - lon) < 1e-5 and abs(blat[0] - lat) < 1e-5


@given(china_lon, china_lat)
@settings(max_examples=100, deadline=None)
def test_wgs_gcj_roundtrip_small_residual(lon, lat):
    glon, glat = geo.wgs84_to_gcj02(np.array([lon]), np.array([lat]))
    wlon, wlat = geo.gcj02_to_wgs84(glon, glat)
    # one-step inverse (reference semantics) → small residual, not exact
    assert abs(wlon[0] - lon) < 5e-3 and abs(wlat[0] - lat) < 5e-3


def test_out_of_china_identity():
    lon, lat = geo.wgs84_to_gcj02(np.array([2.35]), np.array([48.85]))  # Paris
    assert lon[0] == 2.35 and lat[0] == 48.85


def test_offset_is_nonzero_inside_china():
    lon, lat = geo.wgs84_to_gcj02(np.array([116.39]), np.array([39.91]))  # Beijing
    assert abs(lon[0] - 116.39) > 1e-4 and abs(lat[0] - 39.91) > 1e-4


def test_udf_matches_numpy(spark):
    pdf = pd.DataFrame({"lon": [116.39, 121.47, 2.35], "lat": [39.91, 31.23, 48.85]})
    df = spark.createDataFrame(pdf)
    got = (
        df.select(geo.wgs84_to_gcj02_udf("lon", "lat").alias("c"))
        .select("c.lon", "c.lat")
        .toPandas()
    )
    exp_lon, exp_lat = geo.wgs84_to_gcj02(pdf.lon.to_numpy(), pdf.lat.to_numpy())
    assert np.allclose(got.lon, exp_lon) and np.allclose(got.lat, exp_lat)
