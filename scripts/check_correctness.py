#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry AND its oracle_sql() on the same parquet
tables, compare row count, column names, and (sorted) values exactly.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(v):
    import datetime
    import decimal

    import numpy as np
    import pandas as pd

    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return None
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, (np.ndarray,)):
        return tuple(_canon(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, bytearray):
        return bytes(v)
    return v


def _rowset(df):
    cols = sorted(df.columns)
    rows = [tuple(_canon(v) for v in row) for row in df[cols].itertuples(index=False)]
    return cols, sorted(rows, key=repr)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entry
    from orc_rust_spark.session import get_spark

    spark = get_spark("correctness-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"{name}: SPARK ERROR {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name}: no_oracle rows={len(sdf)}")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            print(f"{name}: ORACLE ERROR {ex}")
            failures += 1
            continue
        scols, srows = _rowset(sdf)
        ocols, orows = _rowset(odf)
        ok_rows = len(srows) == len(orows)
        ok_cols = scols == ocols
        ok_vals = srows == orows
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        print(f"{name}: {status} rows={len(srows)}/{len(orows)} cols_match={ok_cols} vals_match={ok_vals}")
        if status == "FAIL":
            failures += 1
            if not ok_cols:
                print(f"  spark cols:  {scols}\n  oracle cols: {ocols}")
            if ok_cols and not ok_vals:
                diffs = 0
                for a, b in zip(srows, orows):
                    if a != b:
                        print(f"  spark:  {a}\n  oracle: {b}")
                        diffs += 1
                        if diffs >= 3:
                            break
                if len(srows) != len(orows):
                    sset, oset = set(srows), set(orows)
                    print(f"  only-spark: {list(sset - oset)[:2]}")
                    print(f"  only-oracle: {list(oset - sset)[:2]}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
