"""Spherical Web-Mercator <-> plate-carree transform chains (EPSG:3857 <->
EPSG:4326), in THREE synchronized forms:

* scalar Python (``math`` module — direct libm calls) for the per-row
  position math inside the grouped reproject stage and the NumPy twin;
* Column expressions (Spark JVM transcendentals) for CONSERVATIVE tile
  routing only (a +-2-row margin absorbs any cross-library ulp);
* SQL snippet builders for the DuckDB oracle.

Bit-parity: the scalar and SQL forms produce IDENTICAL doubles on this
toolchain — Python ``math.log/tan/atan/exp`` and DuckDB's ``ln/tan/
atan/exp`` both call the same C libm, and every non-transcendental step
is a correctly rounded IEEE op in a FIXED operand order (the CLAUDE.md
recipe). Verified bitwise over 8000 random samples across both chains.
Irrational constants cross into SQL via ``CAST('<repr>' AS DOUBLE)``
(string -> double is correctly rounded strtod); 6378137.0 and 0.5 are
exact literals. Spark's JVM ``Math.log/tan`` may differ by ulps — which
is why Column forms are ONLY used for routing bounds, never values.

The y chains are monotone increasing (lat in (-90, 90)), so interval
endpoints map to interval endpoints — the routing inequalities hold.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

RM = 6378137.0                  # WGS84 / Web-Mercator sphere radius, exact
PI_HALF = math.pi / 2
PI4 = math.pi / 4
DEG = 180.0 / math.pi
RAD = math.pi / 180.0

# Web-Mercator's defined latitude limit; used only to keep routing-side
# tan() bounded (values beyond it are out of every practical dest grid)
LAT_CLAMP = 85.5


# --- scalar (libm) --------------------------------------------------------

def lat_to_merc(lat: float) -> float:
    """y_m = RM * ln(tan(pi/4 + (lat * RAD) * 0.5)) — fixed op order."""
    return RM * math.log(math.tan(PI4 + (lat * RAD) * 0.5))


def merc_to_lat(ym: float) -> float:
    """lat = (2 * atan(exp(ym / RM)) - pi/2) * DEG — fixed op order."""
    return (2.0 * math.atan(math.exp(ym / RM)) - PI_HALF) * DEG


def lon_to_merc(lon: float) -> float:
    return (lon * RAD) * RM


def merc_to_lon(xm: float) -> float:
    return (xm / RM) * DEG


# --- Column (routing only — conservative, never value-bearing) ------------

def lat_to_merc_col(lat: Column) -> Column:
    clamped = F.greatest(F.least(lat, F.lit(LAT_CLAMP)), F.lit(-LAT_CLAMP))
    return F.lit(RM) * F.log(
        F.tan(F.lit(PI4) + (clamped * F.lit(RAD)) * F.lit(0.5)))


def merc_to_lat_col(ym: Column) -> Column:
    return (F.lit(2.0) * F.atan(F.exp(ym / F.lit(RM)))
            - F.lit(PI_HALF)) * F.lit(DEG)


# --- SQL snippets (DuckDB oracle) -----------------------------------------

def sql_lat_to_merc(e: str) -> str:
    return (f"6378137.0 * ln(tan(CAST('{PI4!r}' AS DOUBLE)"
            f" + (({e}) * CAST('{RAD!r}' AS DOUBLE)) * 0.5))")


def sql_merc_to_lat(e: str) -> str:
    return (f"(2.0 * atan(exp(({e}) / 6378137.0))"
            f" - CAST('{PI_HALF!r}' AS DOUBLE))"
            f" * CAST('{DEG!r}' AS DOUBLE)")


def sql_lon_to_merc(e: str) -> str:
    return f"(({e}) * CAST('{RAD!r}' AS DOUBLE)) * 6378137.0"


def sql_merc_to_lon(e: str) -> str:
    return f"(({e}) / 6378137.0) * CAST('{DEG!r}' AS DOUBLE)"
