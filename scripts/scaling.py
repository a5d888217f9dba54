#!/usr/bin/env python
"""Scaling-efficiency evidence: the identical encode job at N and 4N cores
on identical input splits (the sandbox stand-in for N vs 4N executors —
BASELINE.md 'Scaling efficiency' row).

Measures local[2], local[8], local[32] (each in its own subprocess/JVM,
full warm-up + min of reps, noop sink so only the encode pipeline is
timed) and reports efficiency for both 4x pairs:

- 2 -> 8   : the CPU-bound regime (this single box's memory bandwidth is
             not saturated) — the number comparable to adding executors
             on a real cluster, where each node brings its own bandwidth
- 8 -> 32  : additionally crosses this VM's aggregate memory-bandwidth
             ceiling (~0.7 GB/s end-to-end measured); reported for honesty

Usage:
  python scripts/scaling.py             # orchestrate and print JSON
  python scripts/scaling.py --measure 8 # one measurement (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "2000000"))
CORES = (2, 8, 32)


def measure(cpus: int, reps: int = int(os.environ.get("SCALING_REPS", "3"))) -> dict:
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from orc_rust_spark.operators.decode import decode_table_arrow
    from orc_rust_spark.operators.encode import encode_table
    from orc_rust_spark.plans.pipeline import plan_codecs
    from orc_rust_spark.session import get_spark
    from orc_rust_spark.sources.webtext import WEBTEXT_SCHEMA

    spark = get_spark(f"scaling-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # identical input splits at every cluster size (default split planning
    # depends on defaultParallelism, which would change the work units)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
    cache = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/orc_rust_spark_bench")
    path = os.path.join(cache, f"webtext_{ROWS}_64.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from orc_rust_spark.sources.webtext import webtext_df

        webtext_df(spark, ROWS, num_partitions=64).write.mode("overwrite").parquet(path)
    src = spark.read.parquet(path)
    plan = plan_codecs(src)
    raw = int(
        encode_table(src, plan=plan).agg(F.sum("raw_bytes")).collect()[0][0]
    )  # warm-up (page-fault amortization) + raw-size capture
    times = []
    for _ in range(reps):
        t0 = time.time()
        encode_table(src, plan=plan).write.format("noop").mode("overwrite").save()
        times.append(time.time() - t0)
    enc_best = min(times)

    # --- decode direction (VERDICT r3 next #9): the same chunk table —
    # persisted ONCE (64 files, one per encode partition) and shared by
    # every cluster size — decoded back to rows through the Arrow decode
    # path, at EXACTLY one file per split so each task sees its file's
    # chunks contiguously in encode order and co_locate=False is valid:
    # this measures the DECODE ENGINE (parquet read + block decompress +
    # RLE/dict/FSST kernels), not a 1 GB co-locate shuffle whose IO noise
    # dominated early measurements by 3x. One-file-per-split is FORCED
    # via a huge openCostInBytes (each file's padded cost exceeds
    # maxSplitBytes, so bin-packing closes a partition per file) — the
    # prior 256 MiB maxPartitionBytes alone let maxSplitBytes shrink
    # with defaultParallelism (total/N), so the work decomposition VARIED
    # with cluster size and the decode scaling numbers compared different
    # decompositions (code-review r6). 64 fixed work units >= 32 cores,
    # identical at every cluster size.
    chunks_path = os.path.join(cache, f"webtext_chunks_{ROWS}.parquet")
    if not os.path.exists(os.path.join(chunks_path, "_SUCCESS")):
        encode_table(src, plan=plan).write.mode("overwrite").parquet(chunks_path)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(256 * 1024 * 1024))
    prev_open_cost = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.openCostInBytes", str(1 << 30))
    chunks = spark.read.parquet(chunks_path)
    decode_table_arrow(chunks, WEBTEXT_SCHEMA, co_locate=False).write.format(
        "noop").mode("overwrite").save()  # warm decode-stage workers
    dec_times = []
    for _ in range(reps):
        t0 = time.time()
        decode_table_arrow(chunks, WEBTEXT_SCHEMA, co_locate=False).write.format(
            "noop").mode("overwrite").save()
        dec_times.append(time.time() - t0)
    dec_best = min(dec_times)
    spark.conf.set("spark.sql.files.openCostInBytes", prev_open_cost)

    # --- orcx sink direction (VERDICT r4 next #10): the same webtext rows
    # written as REAL indexed ORC through df.write.format("orcx") — the
    # full writer path (stream encode, ROW_INDEX + stats, zlib block
    # compression, streamed stripe append, two-phase commit). Same fixed
    # 64-split input at every cluster size.
    import shutil

    from orc_rust_spark.sources.datasource import OrcRustDataSource

    spark.dataSource.register(OrcRustDataSource)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
    sink = os.path.join(cache, f"orcx_scaling_sink_{cpus}")
    wr_times = []
    for i in range(reps + 1):  # first run is warm-up
        t0 = time.time()
        src.write.format("orcx").mode("overwrite").save(sink)
        if i:
            wr_times.append(time.time() - t0)
    wr_best = min(wr_times)
    shutil.rmtree(sink, ignore_errors=True)
    spark.stop()
    return {
        "cpus": cpus,
        "wall_sec": round(enc_best, 3),
        "all_times": [round(t, 3) for t in times],
        "raw_gb": round(raw / 1e9, 4),
        "gb_per_sec": round(raw / 1e9 / enc_best, 4),
        "decode_wall_sec": round(dec_best, 3),
        "decode_all_times": [round(t, 3) for t in dec_times],
        "decode_gb_per_sec": round(raw / 1e9 / dec_best, 4),
        "orcx_write_wall_sec": round(wr_best, 3),
        "orcx_write_all_times": [round(t, 3) for t in wr_times],
        "orcx_write_gb_per_sec": round(raw / 1e9 / wr_best, 4),
    }


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--measure":
        print(json.dumps(measure(int(sys.argv[2]))))
        return
    results = {}
    for cpus in CORES:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--measure", str(cpus)],
            capture_output=True, text=True, cwd=REPO, timeout=3000,
        )
        if out.returncode != 0 or not out.stdout.strip():
            # forward the child's traceback instead of an IndexError with
            # zero context (code-review r6)
            sys.stderr.write(out.stderr)
            raise RuntimeError(
                f"measure({cpus}) failed with rc={out.returncode}")
        line = out.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
    eff_2_8 = (results[2]["wall_sec"] / results[8]["wall_sec"]) / 4
    eff_8_32 = (results[8]["wall_sec"] / results[32]["wall_sec"]) / 4
    dec_eff_2_8 = (results[2]["decode_wall_sec"] / results[8]["decode_wall_sec"]) / 4
    dec_eff_8_32 = (results[8]["decode_wall_sec"] / results[32]["decode_wall_sec"]) / 4
    wr_eff_2_8 = (results[2]["orcx_write_wall_sec"]
                  / results[8]["orcx_write_wall_sec"]) / 4
    wr_eff_8_32 = (results[8]["orcx_write_wall_sec"]
                   / results[32]["orcx_write_wall_sec"]) / 4
    summary = {
        "raw_gb": results[8]["raw_gb"],
        "wall_sec": {c: results[c]["wall_sec"] for c in CORES},
        "gb_per_sec": {c: results[c]["gb_per_sec"] for c in CORES},
        "efficiency_n2_to_4n8": round(eff_2_8, 3),
        "efficiency_n8_to_4n32": round(eff_8_32, 3),
        "decode_wall_sec": {c: results[c]["decode_wall_sec"] for c in CORES},
        "decode_gb_per_sec": {c: results[c]["decode_gb_per_sec"] for c in CORES},
        "decode_efficiency_n2_to_4n8": round(dec_eff_2_8, 3),
        "decode_efficiency_n8_to_4n32": round(dec_eff_8_32, 3),
        "orcx_write_wall_sec": {c: results[c]["orcx_write_wall_sec"] for c in CORES},
        "orcx_write_gb_per_sec": {c: results[c]["orcx_write_gb_per_sec"] for c in CORES},
        "orcx_write_efficiency_n2_to_4n8": round(wr_eff_2_8, 3),
        "orcx_write_efficiency_n8_to_4n32": round(wr_eff_8_32, 3),
        "detail": results,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
