#!/usr/bin/env python
"""Compaction evidence: zero-decode stripe-copy merge vs the naive
decode+re-encode compactor on the SAME small-file ORC corpus.

A streaming sink accumulates one file per micro-batch; at crawl scale
that is millions of small files. The two ways to compact them:

- `compact_orc` (sources/orc_merge.py): byte-copy whole stripes, write a
  fresh tail — no decompression, no decode, no shuffle; one task per
  output bin. Cost = sequential IO of the compressed bytes.
- re-encode: `read.format("orcx") -> write.format("orcx")` — full
  decode (block decompress + RLE/dict kernels) and full re-encode
  (stats, ROW_INDEX, blooms, zlib). What you'd do without a stripe-copy
  merge, and what any engine-agnostic compactor does.

Both produce prunable single-ORC outputs with identical rows (verified
here via this engine's reader row counts). The printed speedup is the
argument for shipping a merge primitive at all: at 100 TB the compactor
runs at object-store COPY bandwidth instead of cluster decode+encode
throughput, and holds no row memory.

Usage: python scripts/compact_bench.py  [--rows N] [--files K] [--reps R]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--files", type=int, default=64)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from orc_rust_spark.session import get_spark
    from orc_rust_spark.sources.datasource import OrcRustDataSource
    from orc_rust_spark.sources.orc_merge import compact_orc
    from orc_rust_spark.sources.webtext import webtext_df

    spark = get_spark("compact-bench", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(OrcRustDataSource)

    cache = os.environ.get("SPARK_GRAFT_BENCH_CACHE",
                           "/tmp/orc_rust_spark_bench")
    corpus = os.path.join(cache, f"compact_corpus_{args.rows}_{args.files}")
    n_cached = (len([f for f in os.listdir(corpus) if f.endswith(".orc")])
                if os.path.isdir(corpus) else 0)
    if n_cached != args.files:
        # the corpus a streaming sink leaves behind: many small indexed
        # ORC files (one per task), written once and shared by every rep
        webtext_df(spark, args.rows, num_partitions=args.files).write.format(
            "orcx").mode("overwrite").save(corpus)
    in_files = [os.path.join(corpus, f) for f in os.listdir(corpus)
                if f.endswith(".orc")]
    in_bytes = sum(os.path.getsize(f) for f in in_files)
    target = max(in_bytes // 16, 1)  # ~16 output bins: 2x task waves @8

    def _rows_of(path: str) -> int:
        return (spark.read.format("orcx").load(path)
                .selectExpr("count(*) AS c").collect()[0]["c"])

    src_rows = _rows_of(corpus)

    # --- zero-decode stripe-copy compaction --------------------------------
    copy_times, copy_out = [], None
    for i in range(args.reps + 1):  # first run warms workers/page cache
        out = os.path.join(cache, "compact_out_copy")
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        compact_orc(spark, corpus, out, target_bytes=target).collect()
        dt = time.time() - t0
        if i:
            copy_times.append(dt)
        copy_out = out
    assert _rows_of(copy_out) == src_rows, "stripe-copy compaction lost rows"
    n_out_copy = len([f for f in os.listdir(copy_out) if f.endswith(".orc")])

    # --- decode + re-encode compaction (the engine-agnostic baseline) ------
    # coalesce to the SAME output-file count so both compactors do the
    # same job; coalesce (not repartition) avoids charging it a shuffle
    reenc_times, reenc_out = [], None
    for i in range(args.reps + 1):
        out = os.path.join(cache, "compact_out_reenc")
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        (spark.read.format("orcx").load(corpus).coalesce(n_out_copy)
         .write.format("orcx").mode("overwrite").save(out))
        dt = time.time() - t0
        if i:
            reenc_times.append(dt)
        reenc_out = out
    assert _rows_of(reenc_out) == src_rows, "re-encode compaction lost rows"

    copy_s, reenc_s = min(copy_times), min(reenc_times)
    print(json.dumps({
        "corpus_files": len(in_files),
        "corpus_mb": round(in_bytes / 1e6, 1),
        "out_files": n_out_copy,
        "rows": src_rows,
        "stripe_copy_sec": round(copy_s, 3),
        "stripe_copy_mb_s": round(in_bytes / 1e6 / copy_s, 1),
        "reencode_sec": round(reenc_s, 3),
        "reencode_mb_s": round(in_bytes / 1e6 / reenc_s, 1),
        "speedup": round(reenc_s / copy_s, 1),
        "copy_all_times": [round(t, 3) for t in copy_times],
        "reencode_all_times": [round(t, 3) for t in reenc_times],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
