#!/usr/bin/env python
"""Scaling-efficiency evidence: the identical encode job at local[N] and
local[4N] on identical input (the sandbox stand-in for N vs 4N executors —
BASELINE.md 'Scaling efficiency' row).

Each measurement runs in a fresh subprocess (its own JVM): full warm-up
pass, then `reps` timed encodes, min taken. Efficiency = (T_N / T_4N) / 4.

Usage:
  python scripts/scaling.py            # orchestrate 8 vs 32 and print JSON
  python scripts/scaling.py --measure 8  # one measurement (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "120000"))


def measure(cpus: int, reps: int = int(os.environ.get("SCALING_REPS", "3"))) -> dict:
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from orc_rust_spark.operators.encode import encode_table
    from orc_rust_spark.plans.pipeline import plan_codecs
    from orc_rust_spark.session import get_spark

    spark = get_spark(f"scaling-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # identical input splits at both cluster sizes (default split planning
    # depends on defaultParallelism, which would change the work units)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
    # fixed partitioning so both cluster sizes do identical work
    path = os.path.join(
        os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/orc_rust_spark_bench"),
        f"webtext_{ROWS}_64.parquet",
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from orc_rust_spark.sources.webtext import webtext_df

        webtext_df(spark, ROWS, num_partitions=64).write.mode("overwrite").parquet(path)
    src = spark.read.parquet(path)
    plan = plan_codecs(src)
    raw = None
    encode_table(src, plan=plan).count()  # warm-up (page-fault amortization)
    times = []
    for _ in range(reps):
        t0 = time.time()
        agg = encode_table(src, plan=plan).agg(F.sum("raw_bytes")).collect()
        times.append(time.time() - t0)
        raw = int(agg[0][0])
    spark.stop()
    best = min(times)
    return {
        "cpus": cpus,
        "wall_sec": round(best, 3),
        "all_times": [round(t, 3) for t in times],
        "raw_gb": round(raw / 1e9, 4),
        "gb_per_sec": round(raw / 1e9 / best, 4),
    }


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--measure":
        print(json.dumps(measure(int(sys.argv[2]))))
        return
    results = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--measure", str(cpus)],
            capture_output=True, text=True, cwd=REPO, timeout=1800,
        )
        line = out.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
    t_n, t_4n = results[8]["wall_sec"], results[32]["wall_sec"]
    eff = (t_n / t_4n) / 4
    summary = {
        "n_cores": 8,
        "four_n_cores": 32,
        "t_n_sec": t_n,
        "t_4n_sec": t_4n,
        "gb_per_sec_n": results[8]["gb_per_sec"],
        "gb_per_sec_4n": results[32]["gb_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "raw_gb": results[8]["raw_gb"],
        "detail": results,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
