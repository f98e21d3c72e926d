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


# ---------------------------------------------------------------------------
# DuckDB SQL mirror — the correctness oracle for the datum transforms.
#
# Every expression mirrors the numpy code above operation-for-operation
# (same literals, same association order) so both engines compute the
# same IEEE-754 doubles. Pure-constant subexpressions are folded in
# PYTHON and inlined via repr() — DuckDB parses bare decimal literals
# as DECIMAL, and decimal-decimal arithmetic (exact) would diverge from
# numpy's double-double; repr() round-trips to the identical double.
# Mixed decimal-literal × double-column ops promote to double per-op,
# matching numpy elementwise semantics.
# ---------------------------------------------------------------------------
_SQL_PI = repr(float(_PI))
_SQL_X_PI = repr(float(_X_PI))
_SQL_EE = repr(float(_EE))
_SQL_A_1ME = repr(float(_A * (1 - _EE)))  # _A*(1-_EE) folded as doubles
_SQL_A = repr(float(_A))


def _tlat_sql(x: str, y: str) -> str:
    return (
        f"(-100.0 + 2.0 * {x} + 3.0 * {y} + 0.2 * {y} * {y} + 0.1 * {x} * {y}"
        f" + 0.2 * sqrt(abs({x}))"
        f" + (20.0 * sin(6.0 * {x} * {_SQL_PI}) + 20.0 * sin(2.0 * {x} * {_SQL_PI})) * 2.0 / 3.0"
        f" + (20.0 * sin({y} * {_SQL_PI}) + 40.0 * sin({y} / 3.0 * {_SQL_PI})) * 2.0 / 3.0"
        f" + (160.0 * sin({y} / 12.0 * {_SQL_PI}) + 320.0 * sin({y} * {_SQL_PI} / 30.0)) * 2.0 / 3.0)"
    )


def _tlon_sql(x: str, y: str) -> str:
    return (
        f"(300.0 + {x} + 2.0 * {y} + 0.1 * {x} * {x} + 0.1 * {x} * {y}"
        f" + 0.1 * sqrt(abs({x}))"
        f" + (20.0 * sin(6.0 * {x} * {_SQL_PI}) + 20.0 * sin(2.0 * {x} * {_SQL_PI})) * 2.0 / 3.0"
        f" + (20.0 * sin({x} * {_SQL_PI}) + 40.0 * sin({x} / 3.0 * {_SQL_PI})) * 2.0 / 3.0"
        f" + (150.0 * sin({x} / 12.0 * {_SQL_PI}) + 300.0 * sin({x} / 30.0 * {_SQL_PI})) * 2.0 / 3.0)"
    )


def _out_of_china_sql(lon: str, lat: str) -> str:
    return (
        f"NOT (73.66 < {lon} AND {lon} < 135.05"
        f" AND 3.86 < {lat} AND {lat} < 53.55)"
    )


def gcj_offset_ctes(tag: str, src: str, lon: str, lat: str) -> str:
    """CTE fragment computing ``d{tag}_lon`` / ``d{tag}_lat`` (the GCJ-02
    offset at (lon, lat)) staged exactly like ``_gcj_offset``."""
    return f"""
        {tag}_a AS (
          SELECT *, ({lon} - 105.0) AS {tag}_x, ({lat} - 35.0) AS {tag}_y,
                 {lat} / 180.0 * {_SQL_PI} AS {tag}_radlat
          FROM {src}
        ),
        {tag}_b AS (
          SELECT *, {_tlat_sql(f"{tag}_x", f"{tag}_y")} AS {tag}_dlat0,
                 {_tlon_sql(f"{tag}_x", f"{tag}_y")} AS {tag}_dlon0,
                 1 - {_SQL_EE} * sin({tag}_radlat) * sin({tag}_radlat) AS {tag}_magic
          FROM {tag}_a
        ),
        {tag}_c AS (
          SELECT *,
                 ({tag}_dlat0 * 180.0)
                   / ({_SQL_A_1ME} / ({tag}_magic * sqrt({tag}_magic)) * {_SQL_PI})
                   AS d{tag}_lat,
                 ({tag}_dlon0 * 180.0)
                   / ({_SQL_A} / sqrt({tag}_magic) * cos({tag}_radlat) * {_SQL_PI})
                   AS d{tag}_lon
          FROM {tag}_b
        )"""


def datum_chain_oracle_sql(src_sql: str, id_col: str) -> str:
    """Full oracle for wgs84→gcj02 (+bd09 and approximate wgs84 inverse)
    over ``src_sql`` providing (id_col, lon, lat) — outputs rounded 4dp."""
    oc_wgs = _out_of_china_sql("lon", "lat")
    oc_gcj = _out_of_china_sql("glon", "glat")
    return f"""
        WITH src AS ({src_sql}),
        {gcj_offset_ctes("f", "src", "lon", "lat")},
        gcj AS (
          SELECT *, CASE WHEN {oc_wgs} THEN lon ELSE lon + df_lon END AS glon,
                 CASE WHEN {oc_wgs} THEN lat ELSE lat + df_lat END AS glat
          FROM f_c
        ),
        {gcj_offset_ctes("i", "gcj", "glon", "glat")},
        inv AS (
          SELECT *, CASE WHEN {oc_gcj} THEN glon ELSE glon - di_lon END AS blon,
                 CASE WHEN {oc_gcj} THEN glat ELSE glat - di_lat END AS blat
          FROM i_c
        ),
        bd AS (
          SELECT *,
                 sqrt(glon * glon + glat * glat)
                   + 0.00002 * sin(glat * {_SQL_X_PI}) AS z,
                 atan2(glat, glon) + 0.000003 * cos(glon * {_SQL_X_PI}) AS theta
          FROM inv
        )
        SELECT {id_col},
               round(glon, 4) AS gcj_lon, round(glat, 4) AS gcj_lat,
               round(z * cos(theta) + 0.0065, 4) AS bd_lon,
               round(z * sin(theta) + 0.006, 4) AS bd_lat,
               round(blon, 4) AS back_lon, round(blat, 4) AS back_lat
        FROM bd
    """
