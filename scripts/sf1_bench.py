#!/usr/bin/env python
"""One-scale-notch-up bench (VERDICT r5 next #6): the five most expensive
committed queries, once at sf1 (10x the bench's sf0.1), so the 100x-scale
argument doesn't rest on the 4 GB scaling harness alone.

sf1 inputs are derived DETERMINISTICALLY from the driver's read-only
sf0.1 tables (no external data, per the testdata rule): ten shards with
shifted keys. Document text is word-ROTATED per shard (shard i starts at
word i) so cross-shard near-duplicate pairs don't explode the MinHash
workload quadratically — a straight 10x copy would make every doc a
member of a 10-clique and measure an artifact, not the sf1 shape. The
webtext pair scales the generated-corpus row count 10x instead (the
north-rule table has no sf dir).

Prints one JSON line:
  {"sf1_queries": {...sec...}, "sf01_queries": {...}, "ratio": {...}}
where ratio = t_sf1 / t_sf01 (linear expectation ~10, minus fixed costs).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/orc_rust_spark_sf1")
SHARDS = 10
WEBTEXT_SF1_ROWS = 4_800_000  # 10x the committed bench's 480k small shape
REPS = int(os.environ.get("SF1_REPS", "2"))


def _build_sf1(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(SF1_DIR, exist_ok=True)
    def documents_shard(df, i):
        # rotate each doc's words by the shard index: same length/char
        # stats, mostly-different shingles -> near-dup workload stays
        # linear in sf instead of quadratic in the copy count
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
        # deterministic per-shard perturbation decorrelates the copies
        # (pure duplication would give every vector 9 cosine-1.0 twins)
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


def _timed(fn, *args) -> float:
    best = None
    for _ in range(REPS):
        t0 = time.time()
        df = fn(*args)
        df.collect()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def _webtext_pair(spark, n_rows: int) -> tuple[float, float]:
    """(encode_sec, decode_verify_sec) at n_rows, bench.py's small-shape
    protocol (warm + min-of-REPS, digest verify)."""
    from pyspark.sql import functions as F

    from orc_rust_spark.operators.decode import decode_table_arrow
    from orc_rust_spark.operators.encode import encode_table
    from orc_rust_spark.plans.pipeline import plan_codecs
    from orc_rust_spark.sources.webtext import WEBTEXT_SCHEMA, webtext_df

    cache = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/orc_rust_spark_bench")
    path = os.path.join(cache, f"webtext_{n_rows}_64.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        webtext_df(spark, n_rows, num_partitions=64).write.mode(
            "overwrite").parquet(path)
        print(f"built {path}", file=sys.stderr)
    src = spark.read.parquet(path)
    plan = plan_codecs(src)
    encode_table(src, plan=plan).count()  # warm
    enc = None
    for _ in range(REPS):
        t0 = time.time()
        encode_table(src, plan=plan).write.format("noop").mode(
            "overwrite").save()
        dt = time.time() - t0
        enc = dt if enc is None else min(enc, dt)

    cols = [f.name for f in WEBTEXT_SCHEMA.fields]

    def digest(df):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    src_digest = digest(src)
    dec = None
    bad = 0  # ORs across reps (code-review r6)
    for _ in range(REPS):
        t0 = time.time()
        decoded = decode_table_arrow(
            encode_table(src, plan=plan), WEBTEXT_SCHEMA, co_locate=False)
        bad |= 0 if digest(decoded) == src_digest else 1
        dt = time.time() - t0
        dec = dt if dec is None else min(dec, dt)
    assert bad == 0, "sf1 webtext decode verify MISMATCH"
    return round(enc, 3), round(dec, 3)


def main() -> None:
    from orc_rust_spark.session import get_spark

    import __spark_entry__ as entry

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("sf1-bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    _build_sf1(spark)

    from orc_rust_spark.operators.dedup import neardup_components

    out: dict[str, dict] = {"sf1_queries": {}, "sf01_queries": {}}
    rounds: dict[str, int | None] = {}
    for name in ("roundtrip_lineitem", "minhash_lsh_neardup",
                 "minhash_dedup_clusters", "ann_ivf_multiprobe",
                 "orcx_partitioned_write"):
        fn = entry.queries()[name]
        out["sf01_queries"][name] = _timed(fn, spark, SF01)
        if name == "minhash_dedup_clusters":
            rounds["sf01"] = neardup_components.last_rounds
        out["sf1_queries"][name] = _timed(fn, spark, SF1_DIR)
        if name == "minhash_dedup_clusters":
            # the 100 TB claim is O(log component-diameter) rounds ×
            # one edge shuffle per round: at 10x rows the rounds count
            # must stay flat (VERDICT r6 next #4)
            rounds["sf1"] = neardup_components.last_rounds
    out["components_rounds"] = rounds

    e01, d01 = _webtext_pair(spark, 480_000)
    e1, d1 = _webtext_pair(spark, WEBTEXT_SF1_ROWS)
    out["sf01_queries"]["webtext_encode"] = e01
    out["sf01_queries"]["webtext_decode_verify"] = d01
    out["sf1_queries"]["webtext_encode"] = e1
    out["sf1_queries"]["webtext_decode_verify"] = d1

    out["ratio"] = {
        k: round(out["sf1_queries"][k] / max(out["sf01_queries"][k], 1e-9), 2)
        for k in out["sf1_queries"]
    }
    out["reps"] = REPS
    out["cpus"] = cpus
    line = json.dumps(out)
    print(line)
    if "--out" in sys.argv:  # committed-artifact protocol (BENCH_rNN_sf1)
        with open(sys.argv[sys.argv.index("--out") + 1], "w") as fh:
            fh.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
