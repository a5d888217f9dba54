#!/usr/bin/env python
"""Measure orc_scan in-task stripe readahead depth 1 vs 2 vs 4 on the
engine's real ORC decode path (VERDICT r6 next #3: the depth became
configurable for high-latency object stores; this records that depth > 1
does not REGRESS on local disk, where fetch latency is ~0 and the
prefetch threads only add queue bookkeeping).

Shape: lineitem (5 columns) from $SPARK_GRAFT_SF_DIR written once as
8 zstd ORC files x 4 stripes each = 32 stripes, so a local[8] scan gives
every task a multi-stripe, multi-FILE split row sequence — the prefetch
queue actually crosses file boundaries, exercising the r7 code path.

Prints one JSON line: {"readahead": {"1": sec, "2": sec, "4": sec},
"rows": N, "files": F, "stripes": S} (min of REPS full-scan aggregates).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/orc_rust_spark_bench")
REPS = int(os.environ.get("READAHEAD_REPS", "3"))
FILES = 8
DDL = ("l_orderkey long, l_partkey long, l_quantity double, "
       "l_returnflag string, l_shipdate timestamp_ntz")


def main() -> None:
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from orc_rust_spark.session import get_spark
    from orc_rust_spark.sources.orc_file import (orc_scan, read_metadata,
                                                 write_orc)

    root = os.path.join(SCRATCH, "readahead_lineitem_orc")
    os.makedirs(root, exist_ok=True)
    tbl = pq.read_table(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_quantity",
                 "l_returnflag", "l_shipdate"])
    per = (tbl.num_rows + FILES - 1) // FILES
    stripes = 0
    for i in range(FILES):
        path = os.path.join(root, f"part-{i}.orc")
        shard = tbl.slice(i * per, per)
        if not os.path.exists(path):
            write_orc(shard, path + ".tmp", compression="zstd",
                      stripe_rows=max(1, (shard.num_rows + 3) // 4))
            os.rename(path + ".tmp", path)
        stripes += len(read_metadata(path).stripes)

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark("readahead-bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def scan(depth: int):
        return orc_scan(spark, root, DDL, readahead=depth).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_orderkey").alias("s"))

    base = scan(1).collect()[0]
    out: dict[str, float] = {}
    for depth in (1, 2, 4):
        best = None
        for _ in range(REPS):
            t0 = time.time()
            row = scan(depth).collect()[0]
            dt = time.time() - t0
            assert (row["n"], row["s"]) == (base["n"], base["s"]), depth
            best = dt if best is None else min(best, dt)
        out[str(depth)] = round(best, 3)

    print(json.dumps({"readahead": out, "rows": tbl.num_rows,
                      "files": FILES, "stripes": stripes, "reps": REPS,
                      "cpus": cpus}))
    spark.stop()


if __name__ == "__main__":
    main()
