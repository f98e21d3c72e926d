"""Geodetic datum transforms: WGS-84 ↔ GCJ-02 ↔ BD-09, vectorized.

The reference converts coordinates between the three datums with
per-row Python trig (reference: utils/utility_geocode.py:13-96, series
:99-120, China-bounds guard :123-130; applied at
handlers/baidu_api.py:72-76 and handlers/amap_api.py:57-61 — SURVEY
§2.9 Geo math). The algorithms themselves are the widely published
GCJ-02 obfuscation series and the BD-09 polar offset.

Here each transform is pure numpy over coordinate arrays and exposed
as an Arrow-batched ``pandas_udf`` returning
``struct<lon:double, lat:double>`` — per input_hint, no per-row
Python. Outside-China inputs pass through unchanged (the reference's
guard), making every transform total.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

_PI = np.pi
_X_PI = np.pi * 3000.0 / 180.0
_A = 6378245.0  # GCJ-02 reference ellipsoid semi-major axis
_EE = 0.00669342162296594323  # eccentricity squared

COORD_STRUCT = StructType(
    [StructField("lon", DoubleType()), StructField("lat", DoubleType())]
)


def _out_of_china(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    return ~((73.66 < lon) & (lon < 135.05) & (3.86 < lat) & (lat < 53.55))


def _transform_lat(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    ret = (
        -100.0 + 2.0 * x + 3.0 * y + 0.2 * y * y + 0.1 * x * y
        + 0.2 * np.sqrt(np.abs(x))
    )
    ret += (20.0 * np.sin(6.0 * x * _PI) + 20.0 * np.sin(2.0 * x * _PI)) * 2.0 / 3.0
    ret += (20.0 * np.sin(y * _PI) + 40.0 * np.sin(y / 3.0 * _PI)) * 2.0 / 3.0
    ret += (160.0 * np.sin(y / 12.0 * _PI) + 320.0 * np.sin(y * _PI / 30.0)) * 2.0 / 3.0
    return ret


def _transform_lon(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    ret = (
        300.0 + x + 2.0 * y + 0.1 * x * x + 0.1 * x * y
        + 0.1 * np.sqrt(np.abs(x))
    )
    ret += (20.0 * np.sin(6.0 * x * _PI) + 20.0 * np.sin(2.0 * x * _PI)) * 2.0 / 3.0
    ret += (20.0 * np.sin(x * _PI) + 40.0 * np.sin(x / 3.0 * _PI)) * 2.0 / 3.0
    ret += (150.0 * np.sin(x / 12.0 * _PI) + 300.0 * np.sin(x / 30.0 * _PI)) * 2.0 / 3.0
    return ret


def _gcj_offset(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    dlat = _transform_lat(lon - 105.0, lat - 35.0)
    dlon = _transform_lon(lon - 105.0, lat - 35.0)
    radlat = lat / 180.0 * _PI
    magic = np.sin(radlat)
    magic = 1 - _EE * magic * magic
    sqrtmagic = np.sqrt(magic)
    dlat = (dlat * 180.0) / ((_A * (1 - _EE)) / (magic * sqrtmagic) * _PI)
    dlon = (dlon * 180.0) / (_A / sqrtmagic * np.cos(radlat) * _PI)
    return dlon, dlat


def wgs84_to_gcj02(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    dlon, dlat = _gcj_offset(lon, lat)
    mask = _out_of_china(lon, lat)
    out_lon = np.where(mask, lon, lon + dlon)
    out_lat = np.where(mask, lat, lat + dlat)
    return out_lon, out_lat


def gcj02_to_wgs84(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Approximate inverse (one offset subtraction — the reference's
    approach; residual < 1e-2 arcsec scale, see tests)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    dlon, dlat = _gcj_offset(lon, lat)
    mask = _out_of_china(lon, lat)
    out_lon = np.where(mask, lon, lon - dlon)
    out_lat = np.where(mask, lat, lat - dlat)
    return out_lon, out_lat


def gcj02_to_bd09(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    z = np.sqrt(lon * lon + lat * lat) + 0.00002 * np.sin(lat * _X_PI)
    theta = np.arctan2(lat, lon) + 0.000003 * np.cos(lon * _X_PI)
    return z * np.cos(theta) + 0.0065, z * np.sin(theta) + 0.006


def bd09_to_gcj02(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = lon - 0.0065
    y = lat - 0.006
    z = np.sqrt(x * x + y * y) - 0.00002 * np.sin(y * _X_PI)
    theta = np.arctan2(y, x) - 0.000003 * np.cos(x * _X_PI)
    return z * np.cos(theta), z * np.sin(theta)


def _make_udf(fn):
    @F.pandas_udf(COORD_STRUCT)
    def udf(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
        out_lon, out_lat = fn(lon.to_numpy(), lat.to_numpy())
        return pd.DataFrame({"lon": out_lon, "lat": out_lat})

    return udf


wgs84_to_gcj02_udf = _make_udf(wgs84_to_gcj02)
gcj02_to_wgs84_udf = _make_udf(gcj02_to_wgs84)
gcj02_to_bd09_udf = _make_udf(gcj02_to_bd09)
bd09_to_gcj02_udf = _make_udf(bd09_to_gcj02)
