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


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Inner/left join of ``skewed`` (hot keys) with ``other`` on column
    ``on``, salted ``salt`` ways. Deterministic: the salt is a hash of the
    skewed side's whole row id-ish columns, not rand()."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left")
    s = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt))
    )
    o = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = s.join(o, [on, "__salt"], how)
    return out.drop("__salt")
