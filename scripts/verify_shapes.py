#!/usr/bin/env python
"""Measure BOTH verify shapes once, for BASELINE.md comparability
(VERDICT r2 'What's wrong' #2 asked for r1-shape vs r2-shape numbers):

- r1 shape: decode -> full-outer join source on url -> compare `text`
  (2x-corpus shuffle; what round 1 timed at 9.6 s)
- r2 shape: decode -> order-insensitive xxhash64-multiset digest over ALL
  columns incl. the ~0.7 GB html binary (single map-only stage + partial
  aggregation; the only shape that survives 100 TB)

Both run min-of-3 on the bench webtext input after a full warm-up.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "480000"))
CACHE_DIR = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/orc_rust_spark_bench")


def main():
    from pyspark.sql import functions as F

    from orc_rust_spark.operators.decode import decode_table_arrow
    from orc_rust_spark.operators.encode import encode_table
    from orc_rust_spark.plans.pipeline import plan_codecs
    from orc_rust_spark.session import get_spark
    from orc_rust_spark.sources.webtext import WEBTEXT_SCHEMA, webtext_df

    n_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("verify-shapes", master=f"local[{n_cpus}]",
                      shuffle_partitions=n_cpus)
    spark.sparkContext.setLogLevel("ERROR")
    path = os.path.join(CACHE_DIR, f"webtext_{BENCH_ROWS}_{n_cpus * 2}.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        webtext_df(spark, BENCH_ROWS, num_partitions=n_cpus * 2).write.mode(
            "overwrite").parquet(path)
    src = spark.read.parquet(path)
    plan = plan_codecs(src)
    cols = [f.name for f in WEBTEXT_SCHEMA.fields]

    def r2_shape():
        decoded = decode_table_arrow(encode_table(src, plan=plan),
                                     WEBTEXT_SCHEMA, co_locate=False)
        row = decoded.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return row["n"]

    def r1_shape():
        decoded = decode_table_arrow(encode_table(src, plan=plan),
                                     WEBTEXT_SCHEMA, co_locate=False)
        j = src.alias("s").join(decoded.alias("d"), on="url", how="full")
        row = j.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(~F.col("s.text").eqNullSafe(F.col("d.text")), 1)
                  .otherwise(0)).alias("mismatches"),
        ).collect()[0]
        return row["mismatches"]

    r2_shape()  # warm both python worker stages
    out = {}
    for name, fn in (("r2_digest_shape", r2_shape), ("r1_join_shape", r1_shape)):
        best = None
        for _ in range(3):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
