"""Skew-handled join: explicit salting (SURVEY.md §2.3 op 18).

AQE's skew-join splitting (on in session.py) handles most hot keys at
runtime; explicit salting is for the cases AQE can't reach — grouped-map
keys and joins whose build side must replicate. ``salted_join`` implements
the standard recipe: the SKEWED side gets a random-but-deterministic salt
in [0, S); the other side explodes each row S ways; the join key becomes
(key, salt), splitting each hot key's row group across S tasks. Results
are exactly a plain inner join (test-asserted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salt_column(df: DataFrame, salt: int):
    """The salt expression ``salted_join`` assigns to the skewed side:
    hash of (per-partition row ordinal, all columns) mod ``salt``. The
    ordinal term spreads byte-identical duplicate rows; the column terms
    keep distinct rows well-mixed regardless of partition layout."""
    return F.pmod(
        F.xxhash64(F.monotonically_increasing_id(),
                   *[F.col(c) for c in df.columns]),
        F.lit(salt),
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Inner/left join of ``skewed`` (hot keys) with ``other`` on column
    ``on``, salted ``salt`` ways. No rand(): the salt hashes the row's
    columns PLUS a per-partition row ordinal, so even byte-identical
    duplicate rows on a hot key spread across the salt buckets (a
    columns-only hash sends all duplicates to one bucket — salting would
    degrade exactly when the hot key is duplicate-heavy, e.g. dedup
    input). The ordinal is stable for a given partitioning, which is all
    salting needs — the other side replicates to every salt value, so
    the join result is salt-assignment-independent (test-asserted)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left")
    s = skewed.withColumn("__salt", salt_column(skewed, salt))
    o = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = s.join(o, [on, "__salt"], how)
    return out.drop("__salt")
