#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare.

For each query dir under OUT: read the Spark parquet result, run the oracle
SQL in DuckDB (tables registered as views over SF_DIR parquet), sort columns
by name, sort rows, compare values exactly (NaN==NaN; floats bitwise).
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True, kind="mergesort")
    return df


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    # The driver hashes typed values, so int 0 vs float 0.0 is a mismatch
    # there; mirror that exactly instead of relying on Python's 0 == 0.0.
    if isinstance(a, float) != isinstance(b, float):
        return False
    if pd.isna(a) and pd.isna(b):
        return True
    return a == b


def kind_mismatch(g: pd.DataFrame, e: pd.DataFrame):
    """Integer-kind vs float-kind column pairs hash differently in the driver."""
    for col in g.columns:
        gk, ek = g[col].dtype.kind, e[col].dtype.kind
        if {gk, ek} <= {"i", "u"} or gk == ek:
            continue
        if "f" in (gk, ek) and (gk in "iu" or ek in "iu"):
            return (col, g[col].dtype, e[col].dtype)
    return None


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            failures += 1
            continue
        try:
            rel = con.sql(sql)
            huge = [c for c, t in zip(rel.columns, rel.types) if "HUGEINT" in str(t).upper()]
            if huge:
                # HUGEINT becomes float64 in pandas and the driver hashes the
                # floats — the oracle must CAST these columns to BIGINT.
                print(f"FAIL {name}: oracle columns {huge} are HUGEINT (uncast aggregate?) — cast to BIGINT")
                failures += 1
                continue
            exp = rel.df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e)[:200]}")
            failures += 1
            continue
        g, e = canon(got), canon(exp)
        km = kind_mismatch(g, e)
        if km:
            col, gd, ed = km
            print(f"FAIL {name}: dtype kind mismatch col={col}: spark={gd} oracle={ed}")
            failures += 1
            continue
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}")
            failures += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            failures += 1
            continue
        bad = None
        for col in g.columns:
            gv, ev = g[col].tolist(), e[col].tolist()
            for i, (x, y) in enumerate(zip(gv, ev)):
                if not cells_equal(x, y):
                    bad = (col, i, x, y)
                    break
            if bad:
                break
        if bad:
            col, i, x, y = bad
            print(f"FAIL {name}: value mismatch col={col} row={i}: spark={x!r} oracle={y!r}")
            failures += 1
        else:
            print(f"OK   {name}: {len(g)} rows")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
