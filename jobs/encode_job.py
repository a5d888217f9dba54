#!/usr/bin/env python
"""The production encode job — ships via spark-submit --py-files.

    zip -r orc_rust_spark.zip orc_rust_spark
    spark-submit --py-files orc_rust_spark.zip jobs/encode_job.py \
        --input /data/webtext --output /data/encoded \
        --snapshot-id snap-2026-08-16 --repartition-on url

Re-running with the same --snapshot-id resumes from the per-partition
manifest: completed partitions are skipped (checkpoint lineage carries
snapshot id, partition range, codec plan, checksum). Without
--snapshot-id, parquet inputs derive one from a content fingerprint of
the file listing (unchanged input -> automatic resume; changed input ->
fresh encode), and Iceberg inputs (--input-format iceberg) resolve and
pin the table's current snapshot so the manifest always names an
immutable snapshot even if the table receives commits mid-job.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="input table: parquet directory, or an "
                    "Iceberg catalog table name with --input-format iceberg")
    ap.add_argument("--input-format", choices=("parquet", "iceberg"),
                    default="parquet",
                    help="'iceberg' reads via the Iceberg DSv2 source, "
                    "pinned to --snapshot-id (or the table's current "
                    "snapshot, resolved then pinned); needs the "
                    "iceberg-spark-runtime jar + a configured catalog")
    ap.add_argument("--generate", type=int, default=0,
                    help="generate N synthetic webtext rows instead of --input")
    ap.add_argument("--output", required=True)
    ap.add_argument("--snapshot-id", default=None)
    ap.add_argument("--repartition-on", default=None,
                    help="column for salted xxhash64 repartition (e.g. url)")
    ap.add_argument("--num-partitions", type=int, default=None)
    ap.add_argument("--stripe-mb", type=int, default=64)
    ap.add_argument("--verify", action="store_true",
                    help="decode and verify byte-identity after encoding")
    ap.add_argument("--verify-key", default=None,
                    help="join key column for --verify (defaults to "
                    "--repartition-on, else 'url'); required when the "
                    "input has no url column")
    args = ap.parse_args()

    from orc_rust_spark.plans.pipeline import encode_dataset, per_codec_metrics, verify_roundtrip
    from orc_rust_spark.session import get_spark
    from orc_rust_spark.sources.table_source import load_source
    from orc_rust_spark.sources.webtext import webtext_df

    spark = get_spark("orc_rust_spark-encode-job")
    snapshot_id = args.snapshot_id
    if args.generate:
        source = webtext_df(spark, args.generate)
    elif args.input:
        # parquet inputs default to a content-fingerprint snapshot id, so
        # a re-run over unchanged bytes resumes automatically and a
        # changed input never resumes a stale manifest; iceberg inputs
        # pin to a real table snapshot (time travel)
        source, snapshot_id = load_source(
            spark, args.input, fmt=args.input_format,
            snapshot_id=args.snapshot_id)
    else:
        ap.error("one of --input / --generate is required")
        return 2

    summary = encode_dataset(
        spark,
        source,
        args.output,
        snapshot_id=snapshot_id,
        stripe_bytes=args.stripe_mb * 1024 * 1024,
        repartition_on=args.repartition_on,
        num_partitions=args.num_partitions,
    )
    if args.verify:
        key = args.verify_key or args.repartition_on or "url"
        if key not in source.columns:
            ap.error(f"--verify key {key!r} not in input columns "
                     f"{source.columns}; pass --verify-key")
        summary["verify"] = verify_roundtrip(
            spark, source, summary["chunks_dir"], key=key)
    print(json.dumps(summary))
    per_codec_metrics(spark, summary["chunks_dir"]).show(50, truncate=False)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
