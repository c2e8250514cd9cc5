"""Local stand-in for the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark AND its oracle_sql() on DuckDB at
sf0.01, compare row count + column names + order-insensitive values
(exact; floats compared bitwise after float64 normalization).

Usage: python tools/check_oracles.py [sf_dir] [only_query_name ...]

Full runs (no query filter) also write ``ORACLES_LATEST.json`` — a
machine-readable per-query record {status, rows, cols} so the queries
beyond the driver's 50-row CORRECTNESS window carry committed evidence
(VERDICT r4 next-round #9); copy to ORACLES_r{N}.json at round end.
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object and len(s) and isinstance(s.dropna().iloc[0] if len(s.dropna()) else None, (bytes, bytearray)):
            df[c] = s.map(lambda b: None if b is None else bytes(b).hex())
        elif str(s.dtype).startswith(("float", "Float")):
            df[c] = s.astype(np.float64)
        elif str(s.dtype).startswith(("int", "Int", "uint")):
            df[c] = s.astype("int64")
        elif s.dtype == object:
            df[c] = s.map(lambda v: str(v) if v is not None else None)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, a: pd.DataFrame, b: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(a.columns) != sorted(b.columns):
        return [f"columns differ: spark={sorted(a.columns)} duck={sorted(b.columns)}"]
    if len(a) != len(b):
        errs.append(f"row count differs: spark={len(a)} duck={len(b)}")
        return errs
    ca, cb = canon(a), canon(b)
    for c in ca.columns:
        va, vb = ca[c].to_numpy(), cb[c].to_numpy()
        if va.dtype.kind == "f":
            neq = ~((va == vb) | (pd.isna(va) & pd.isna(vb)))
            if neq.any():
                i = int(np.nonzero(neq)[0][0])
                errs.append(
                    f"col {c}: {int(neq.sum())} mismatches, first at row {i}: "
                    f"{va[i]!r} vs {vb[i]!r} (diff {abs(va[i]-vb[i]) if not (math.isnan(va[i]) or math.isnan(vb[i])) else 'nan'})"
                )
        else:
            neq = ~(pd.Series(va).eq(pd.Series(vb)) | (pd.isna(va) & pd.isna(vb)))
            if neq.any():
                i = int(np.nonzero(neq.to_numpy())[0][0])
                errs.append(f"col {c}: {int(neq.sum())} mismatches, first: {va[i]!r} vs {vb[i]!r}")
    return errs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as ent
    from pycuda_raster_spark.session import get_spark

    spark = get_spark("check_oracles", cores=8)
    con = duckdb.connect()
    for t in ent.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = ent.queries()
    oracles = ent.oracle_sql()
    failures = 0
    record: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"[FAIL] {name}: spark raised {type(e).__name__}: {str(e)[:200]}")
            record[name] = {"status": "FAIL",
                            "err": f"spark {type(e).__name__}"}
            failures += 1
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(sdf)} rows, cols={list(sdf.columns)}")
            record[name] = {"status": "rows-only", "rows": len(sdf),
                            "cols": list(sdf.columns)}
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: duckdb raised {type(e).__name__}: {str(e)[:200]}")
            record[name] = {"status": "FAIL",
                            "err": f"duckdb {type(e).__name__}"}
            failures += 1
            continue
        errs = compare(name, sdf, ddf)
        if errs:
            failures += 1
            print(f"[FAIL] {name}:")
            for e in errs:
                print(f"        {e}")
            record[name] = {"status": "FAIL", "err": errs[:3]}
        else:
            print(f"[OK]   {name}: {len(sdf)} rows match exactly")
            record[name] = {"status": "OK", "rows": len(sdf),
                            "cols": list(sdf.columns)}
    print(f"\n{failures} failures")
    if not only:
        import json

        with open("/root/repo/ORACLES_LATEST.json", "w") as f:
            json.dump({"sf_dir": sf_dir, "failures": failures,
                       "n_queries": len(record), "queries": record},
                      f, indent=1)
        print("wrote ORACLES_LATEST.json")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
