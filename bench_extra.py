#!/usr/bin/env python
"""Round-8 optimization measurement harness (guide §1) — bench.py is
FROZEN for the driver's measurement, so per-query isolation, sf1-proxy
timing, and .explain("formatted") capture live here.

Usage:
  python bench_extra.py --sf /root/testdata/sf0.1 --queries ann_cosine_topk
  python bench_extra.py --build-sf1            # derive the sf1 proxy
  python bench_extra.py --sf /tmp/orc_rust_spark_sf1_r8 \
      --queries minhash_dedup_clusters --reps 2 \
      --explain plans/r08 --suffix before

Timing protocol matches bench.py's per-query loop (fn + collect,
min of reps) so numbers are comparable; each query is additionally
labeled with setJobDescription for UI attribution.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/orc_rust_spark_sf1_r8")
SHARDS = 10


def build_sf1(spark) -> None:
    """Deterministic sf1 proxy derived from the read-only sf0.1 tables —
    the same shard-rotate derivation as scripts/sf1_bench.py, extended
    with the events table so every driver query runs at the proxy scale."""
    from pyspark.sql import functions as F

    os.makedirs(SF1_DIR, exist_ok=True)

    def documents_shard(df, i):
        df = df.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000))
        if i == 0:
            return df
        words = F.split(F.col("text"), " ")
        return df.withColumn(
            "text",
            F.array_join(
                F.concat(F.slice(words, i + 1, 1_000_000),
                         F.slice(words, 1, i)), " "),
        )

    jobs = {
        "lineitem": lambda df, i: df.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(i * 10_000_000)),
        "documents": documents_shard,
        "events": lambda df, i: df.withColumn(
            "event_id", F.col("event_id") + F.lit(i * 100_000_000)),
        "embeddings": lambda df, i: df.withColumn(
            "vec_id", F.col("vec_id") + F.lit(i * 1_000_000)
        ).withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x, p: (x + 0.07 * i * F.cos(
                    p.cast("double") * (i + 1) + F.col("vec_id") % 97
                )).cast("float"),
            ),
        ),
    }
    for table, shard_fn in jobs.items():
        out = os.path.join(SF1_DIR, f"{table}.parquet")
        if os.path.exists(os.path.join(out, "_SUCCESS")):
            continue
        src = spark.read.parquet(f"{SF01}/{table}.parquet")
        parts = [shard_fn(src, i) for i in range(SHARDS)]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.repartition(64).write.mode("overwrite").parquet(out)
        print(f"built {out}", file=sys.stderr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=SF01)
    ap.add_argument("--queries", default="")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--explain", default="")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--build-sf1", action="store_true")
    ap.add_argument("--warm", action="store_true",
                    help="run entry.warm_caches first (bench.py protocol)")
    args = ap.parse_args()

    from orc_rust_spark.session import get_spark

    import __spark_entry__ as entry

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-extra-r8", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    if args.build_sf1:
        build_sf1(spark)
        spark.stop()
        return

    if args.warm:
        entry.warm_caches(spark, args.sf)

    wanted = [q for q in args.queries.split(",") if q]
    all_q = entry.queries()
    out: dict[str, float] = {}
    for name in wanted or all_q:
        fn = all_q[name]
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = fn(spark, args.sf)
            with open(os.path.join(
                    args.explain, f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        best = None
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"r8:{name}")
            t0 = time.time()
            df = fn(spark, args.sf)
            df.collect() if df.schema else None
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            spark.sparkContext.setJobDescription(None)
        out[name] = round(best, 3)
        print(f"{name}: {out[name]}", file=sys.stderr)
    print(json.dumps({"sf_dir": args.sf, "reps": args.reps, "queries": out,
                      "total": round(sum(out.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
