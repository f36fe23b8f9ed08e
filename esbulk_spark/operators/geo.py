"""ES geo-query analogs: geo_distance / geo_bounding_box filters and
the geohash_grid bucketing aggregation.

ES geo queries filter documents by distance (haversine) from a point or
by a lat/lon box, and geohash_grid buckets points into geohash cells
(Niemeyer's public base-32 encoding: alternating binary subdivision of
the lon/lat ranges — pure arithmetic, no trig, so Spark and DuckDB
compute identical cells). All expressions are Catalyst-side; the
haversine great-circle distance (public formula, R = 6371.0088 km
IUGG mean radius) is the only trig user.

Scale shape: filters are row-local (pushable predicates over two
numeric columns); geohash_grid is one hash-agg over the cell id. A
bounding-box prefilter derived from the radius makes geo_distance
sargable before the trig runs (min/max lat/lon of the circle), which is
what keeps a 100 TB scan pruned to the relevant parquet row groups.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088
_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (haversine, public formula)."""
    rl1, rl2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = F.sin(dlat) * F.sin(dlat) + F.cos(rl1) * F.cos(rl2) * F.sin(
        dlon
    ) * F.sin(dlon)
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def geo_bounding_box(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    top_left: tuple[float, float],
    bottom_right: tuple[float, float],
) -> DataFrame:
    """ES geo_bounding_box: rows inside the lat/lon box (inclusive)."""
    (t, left), (b, r) = top_left, bottom_right
    return df.filter(
        (F.col(lat_col) <= t)
        & (F.col(lat_col) >= b)
        & (F.col(lon_col) >= left)
        & (F.col(lon_col) <= r)
    )


def geo_distance(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    center: tuple[float, float],
    radius_km: float,
) -> DataFrame:
    """ES geo_distance: rows within radius_km of center, with a
    `distance_km` column. A sargable bounding-box prefilter (the
    circle's lat/lon extent) runs before the haversine so the scan
    prunes without trig; the exact distance then re-filters."""
    clat, clon = center
    r_rad = radius_km / EARTH_RADIUS_KM
    dlat = math.degrees(r_rad)
    # spherical-cap bounding box (Matuschek's "Finding Points Within a
    # Distance", public): the cap's longitude extent is
    # asin(sin(r)/cos(lat)); a cap containing a pole spans every lon
    if abs(clat) + dlat >= 90.0:
        dlon = 180.0
    else:
        dlon = math.degrees(
            math.asin(min(1.0, math.sin(r_rad) / math.cos(math.radians(clat))))
        )
    # longitude extent may cross the antimeridian (Matuschek's
    # crossing-180 case): the box [clon-dlon, clon+dlon] then wraps, so
    # the sargable predicate becomes an OR of two ranges — still
    # pushable (two range predicates over one column), still prunes.
    lon_lo, lon_hi = clon - dlon, clon + dlon
    if dlon >= 180.0:
        lon_pred = F.lit(True)
    elif lon_lo < -180.0:
        lon_pred = (F.col(lon_col) >= lon_lo + 360.0) | (
            F.col(lon_col) <= lon_hi
        )
    elif lon_hi > 180.0:
        lon_pred = (F.col(lon_col) >= lon_lo) | (
            F.col(lon_col) <= lon_hi - 360.0
        )
    else:
        lon_pred = F.col(lon_col).between(lon_lo, lon_hi)
    boxed = df.filter(
        F.col(lat_col).between(clat - dlat, clat + dlat) & lon_pred
    )
    dist = haversine_km(
        F.col(lat_col), F.col(lon_col), F.lit(clat), F.lit(clon)
    )
    return boxed.withColumn("distance_km", dist).filter(
        F.col("distance_km") <= radius_km
    )


def geohash(lat: Column, lon: Column, precision: int = 5) -> Column:
    """Geohash cell string: precision*5 bits interleaved lon-first
    (Niemeyer). Bit k of each axis is floor(frac * 2^(k+1)) % 2 where
    frac is the axis position in [0,1) — the binary expansion of the
    normalized fraction, pure arithmetic any engine computes
    identically (the cross-engine contract). Agrees with the canonical
    interval-bisection formulation everywhere except coordinates within
    one float ulp of a cell boundary, where the two roundings can pick
    adjacent cells (property-fuzzed in tests)."""
    if not 1 <= precision <= 8:
        raise ValueError("precision must be 1..8")
    xlon = (lon + F.lit(180.0)) / F.lit(360.0)
    xlat = (lat + F.lit(90.0)) / F.lit(180.0)
    nbits = precision * 5
    # total bits per axis: lon gets ceil(n/2), lat floor(n/2)
    bits = []
    for k in range(nbits):
        axis, idx = (xlon, k // 2) if k % 2 == 0 else (xlat, k // 2)
        bit = F.floor(axis * F.lit(float(1 << (idx + 1)))).cast("long") % 2
        bits.append(bit)
    chars = []
    for c in range(precision):
        v = F.lit(0)
        for j in range(5):
            v = v * 2 + bits[c * 5 + j]
        chars.append(F.lit(_BASE32).substr(v + 1, F.lit(1)))
    return F.concat(*chars)


def geohash_grid(
    df: DataFrame, lat_col: str, lon_col: str, precision: int = 3
) -> DataFrame:
    """ES geohash_grid agg: doc counts per geohash cell."""
    return (
        df.select(
            geohash(F.col(lat_col), F.col(lon_col), precision).alias("cell")
        )
        .groupBy("cell")
        .agg(F.count("*").alias("doc_count"))
    )
