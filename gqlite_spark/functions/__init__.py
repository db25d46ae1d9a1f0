from .geohash import geohash_decode, geohash_encode, geohash_udf

__all__ = ["geohash_encode", "geohash_decode", "geohash_udf"]
