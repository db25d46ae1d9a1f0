"""Geohash codec — the ``0h'...'`` tagged type (README.md:139; reference
implementation src/Type/Hash.cpp:24-86, standard base-32 geohash at
precision 6 starting on the longitude bit).

``geohash_encode``/``geohash_decode`` are plain Python (driver/UDF-side);
``geohash_udf`` wraps encode as an Arrow-batched pandas UDF for column use.
"""

# NOTE: no `from __future__ import annotations` here — pandas_udf resolves
# the UDF's type hints at decoration time and needs real annotation objects.

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
PRECISION = 6


def geohash_encode(lon: float, lat: float, precision: int = PRECISION) -> str:
    """Standard geohash: interleave lon/lat bisection bits, 5 bits per
    base-32 character (longitude first, Hash.cpp parity)."""
    if not (-90.0 <= lat <= 90.0 and -180.0 <= lon <= 180.0):
        return ""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    out = []
    bit = 0
    ch = 0
    even = True
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon > mid:
                ch = (ch << 1) | 1
                lon_lo = mid
            else:
                ch = ch << 1
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat > mid:
                ch = (ch << 1) | 1
                lat_lo = mid
            else:
                ch = ch << 1
                lat_hi = mid
        even = not even
        bit += 1
        if bit == 5:
            out.append(_BASE32[ch])
            bit = 0
            ch = 0
    return "".join(out)


def geohash_decode(gh: str) -> "tuple[float, float]":
    """Center (lon, lat) of a geohash cell."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    even = True
    for c in gh:
        val = _BASE32.index(c)
        for b in range(4, -1, -1):
            bit = (val >> b) & 1
            if even:
                mid = (lon_lo + lon_hi) / 2
                if bit:
                    lon_lo = mid
                else:
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if bit:
                    lat_lo = mid
                else:
                    lat_hi = mid
            even = not even
    return (lon_lo + lon_hi) / 2, (lat_lo + lat_hi) / 2


def geohash_udf(precision: int = PRECISION):
    """Arrow-batched pandas UDF: (lon, lat) columns → geohash string."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _encode(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series([geohash_encode(lo, la, precision)
                          for lo, la in zip(lon, lat)])

    return _encode
