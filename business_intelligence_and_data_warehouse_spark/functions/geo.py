"""Geospatial helpers: haversine distance as a native column expression.

Mirrors the reference's SQL haversine (`Python Analytics/
PythonAnalysis.py:63-79`: 6371*2*ASIN(SQRT(...)) with NULL guards) —
pure Catalyst math functions, fully codegen'd, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat1: Column, lng1: Column, lat2: Column, lng2: Column) -> Column:
    """Great-circle distance in km; NULL if any coordinate is NULL."""
    dlat = F.radians(lat2 - lat1)
    dlng = F.radians(lng2 - lng1)
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.pow(F.sin(dlng / 2), 2)
    )
    return EARTH_RADIUS_KM * 2 * F.asin(F.sqrt(a))


def synth_coords(key: Column, salt: int = 0) -> tuple[Column, Column]:
    """Deterministic pseudo-coordinates for keyed entities.

    The driver's synthetic star schema has no geography, so geo
    operators are exercised on coordinates derived arithmetically from
    the integer key (same formula in the DuckDB oracle — exact integer
    math, no float divergence)."""
    lat = ((key * 37 + salt) % 1600) / 10.0 - 80.0
    lng = ((key * 73 + salt) % 3600) / 10.0 - 180.0
    return lat, lng


def oracle_synth_coords(key: str, salt: int = 0) -> tuple[str, str]:
    """SQL twin of synth_coords for oracle queries."""
    lat = f"((({key} * 37 + {salt}) % 1600) / 10.0 - 80.0)"
    lng = f"((({key} * 73 + {salt}) % 3600) / 10.0 - 180.0)"
    return lat, lng


def oracle_haversine(lat1: str, lng1: str, lat2: str, lng2: str) -> str:
    """SQL twin of haversine_km."""
    return (
        f"(6371.0 * 2 * asin(sqrt("
        f"pow(sin(radians(({lat2}) - ({lat1})) / 2), 2) + "
        f"cos(radians({lat1})) * cos(radians({lat2})) * "
        f"pow(sin(radians(({lng2}) - ({lng1})) / 2), 2))))"
    )
