#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads the Verify output dir (result parquet per query + oracle_sql.json),
runs each oracle SQL in DuckDB against the same sf tables, sorts columns by
name and rows by all columns, and compares values. Usage:

    python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import decimal, json, math, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def type_kind(v):
    """Coarse type family used for the strictness check. The driver hashes
    TYPED Arrow values, so DuckDB HUGEINT (-> decimal128) vs Spark BIGINT
    (-> int64) is a driver FAIL even when every value is numerically equal
    (the exact r9 bug class: un-cast sum()-derived projections). pandas
    erases that distinction (Decimal(5) == 5), so compare the python type
    family explicitly."""
    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        return "decimal"
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, (int,)):
        return "int"
    if isinstance(v, float):
        return "float"
    if isinstance(v, str):
        return "str"
    if isinstance(v, (bytes, bytearray)):
        return "bytes"
    if isinstance(v, (list, tuple)):
        return "list"
    return type(v).__name__


def values_equal(a, b) -> bool:
    ka, kb = type_kind(a), type_kind(b)
    if ka is not None and kb is not None and ka != kb:
        # int vs float is tolerated only when pandas up-casts a nullable int
        # column to float64 on the spark side; decimal never matches int
        if {ka, kb} != {"int", "float"}:
            return False
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b or abs(a - b) <= 1e-9 * max(abs(a), abs(b))
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        a = list(a) if a is not None else None
        b = list(b) if b is not None else None
        if a is None or b is None:
            return a == b
        return len(a) == len(b) and all(values_equal(x, y) for x, y in zip(a, b))
    if pd.isna(a) and pd.isna(b):
        return True
    try:
        return bool(a == b)
    except Exception:
        return str(a) == str(b)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            failures += 1
            continue
        got = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        try:
            exp = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            failures += 1
            continue
        bad = None
        for col in got.columns:
            gv, ev = got[col].tolist(), exp[col].tolist()
            for i, (g, e) in enumerate(zip(gv, ev)):
                if not values_equal(g, e):
                    bad = (col, i, g, e)
                    break
            if bad:
                break
        if bad:
            col, i, g, e = bad
            print(f"FAIL {name}: value mismatch col={col} row={i}: spark={g!r} duckdb={e!r}")
            failures += 1
        else:
            print(f"OK   {name}: {len(got)} rows x {len(got.columns)} cols")
    print(f"\n{len(oracles) - failures}/{len(oracles)} oracle queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
