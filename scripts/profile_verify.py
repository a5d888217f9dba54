#!/usr/bin/env python
"""Decompose webtext_decode_verify (VERDICT r2 "What's wrong" #2).

Times each pipeline prefix at bench scale so the per-stage cost is
attributable: src-digest (JVM only) -> encode -> encode+decode ->
encode+decode+digest (the full verify shape). Also times a pure-Python
single-thread decode of one chunk group for the kernel-level ceiling.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "480000"))
CACHE_DIR = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/orc_rust_spark_bench")


def timed(fn, reps=2):
    best = None
    for _ in range(reps):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main():
    from pyspark.sql import functions as F

    from orc_rust_spark.operators.decode import decode_table_arrow
    from orc_rust_spark.operators.encode import encode_table
    from orc_rust_spark.plans.pipeline import plan_codecs
    from orc_rust_spark.session import get_spark
    from orc_rust_spark.sources.webtext import WEBTEXT_SCHEMA

    n_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("profile-verify", master=f"local[{n_cpus}]",
                      shuffle_partitions=n_cpus)
    spark.sparkContext.setLogLevel("ERROR")

    path = os.path.join(CACHE_DIR, f"webtext_{BENCH_ROWS}_{n_cpus * 2}.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from orc_rust_spark.sources.webtext import webtext_df
        webtext_df(spark, BENCH_ROWS, num_partitions=n_cpus * 2).write.mode(
            "overwrite").parquet(path)
    src = spark.read.parquet(path)
    plan = plan_codecs(src)
    cols = [f.name for f in WEBTEXT_SCHEMA.fields]

    def digest(df):
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
        ).collect()[0]

    # warm-up: full verify path once untimed
    digest(decode_table_arrow(encode_table(src, plan=plan), WEBTEXT_SCHEMA,
                              co_locate=False))

    out = {}
    out["A_src_digest_jvm_only"] = timed(lambda: digest(src))
    out["B_encode_count"] = timed(lambda: encode_table(src, plan=plan).count())
    out["C_encode_decode_count"] = timed(
        lambda: decode_table_arrow(encode_table(src, plan=plan), WEBTEXT_SCHEMA,
                                   co_locate=False).count())
    out["D_full_verify"] = timed(
        lambda: digest(decode_table_arrow(encode_table(src, plan=plan),
                                          WEBTEXT_SCHEMA, co_locate=False)))
    # digest-without-decimal variant: is the decimal(38,0) sum the cost?
    def digest_long(df):
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64(*cols).cast("double")).alias("h"),
        ).collect()[0]
    out["E_verify_double_digest"] = timed(
        lambda: digest_long(decode_table_arrow(encode_table(src, plan=plan),
                                               WEBTEXT_SCHEMA, co_locate=False)))

    # pure-python kernel ceiling: collect one partition's chunk rows, decode
    # single-threaded
    one = encode_table(src.limit(BENCH_ROWS // n_cpus // 2), plan=plan)
    rows = one.collect()
    from orc_rust_spark.operators.decode import decode_chunk_arrays
    groups = {}
    for r in rows:
        groups.setdefault((r["part_id"], r["chunk_ord"]), []).append(r.asDict())
    kinds = {f.name: f.dataType for f in WEBTEXT_SCHEMA.fields}
    raw = sum(r["raw_bytes"] for r in rows)
    t0 = time.time()
    for g in groups.values():
        decode_chunk_arrays(g, kinds)
    dt = time.time() - t0
    out["F_kernel_decode_1thread"] = {
        "sec": round(dt, 3), "raw_gb": round(raw / 1e9, 4),
        "gb_per_sec": round(raw / 1e9 / dt, 4),
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
