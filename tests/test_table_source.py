"""Input-table loading (sources/table_source.py): parquet content
fingerprints as snapshot identity, and the gated Iceberg branch.

The resume manifest (plans/pipeline.py) skips partitions recorded
"done" for a snapshot id, so the id MUST change whenever the input
bytes can have changed — these tests pin that contract for the parquet
fallback. The Iceberg runtime jar is absent in this sandbox, so the
iceberg branch is verified to fail with ONE actionable error (not a
deep ClassNotFoundException) and its availability probe to return
False; the option-wiring logic is exercised up to that gate.
"""

import os
import time

import pytest

from orc_rust_spark.sources.table_source import (
    iceberg_available,
    load_source,
    parquet_fingerprint,
)


@pytest.fixture()
def pq_dir(tmp_path, spark):
    d = str(tmp_path / "src")
    spark.range(100).selectExpr("id", "concat('u', id) AS url") \
        .coalesce(2).write.parquet(d)
    return d


class TestParquetFingerprint:
    def test_deterministic_for_unchanged_input(self, pq_dir):
        assert parquet_fingerprint(pq_dir) == parquet_fingerprint(pq_dir)

    def test_changes_when_a_file_is_rewritten(self, pq_dir):
        before = parquet_fingerprint(pq_dir)
        name = next(f for f in os.listdir(pq_dir) if f.endswith(".parquet"))
        path = os.path.join(pq_dir, name)
        # same size, later mtime — a rewrite-in-place must still flip the id
        os.utime(path, ns=(time.time_ns(), time.time_ns() + 1))
        assert parquet_fingerprint(pq_dir) != before

    def test_changes_when_a_file_is_added(self, pq_dir, spark, tmp_path):
        before = parquet_fingerprint(pq_dir)
        extra = str(tmp_path / "extra")
        spark.range(1).coalesce(1).write.parquet(extra)
        src = next(f for f in os.listdir(extra) if f.endswith(".parquet"))
        os.rename(os.path.join(extra, src), os.path.join(pq_dir, "zz.parquet"))
        assert parquet_fingerprint(pq_dir) != before

    def test_empty_dir_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            parquet_fingerprint(str(tmp_path))

    def test_remote_uri_returns_none_not_crash(self):
        # spark.read.parquet handles these; the local fingerprint cannot —
        # the caller falls back to a non-resumable run id (code-review r6)
        assert parquet_fingerprint("hdfs://nn/webtext") is None
        assert parquet_fingerprint("s3a://bucket/webtext") is None

    def test_recursive_over_hive_partitioned_layout(self, spark, tmp_path):
        d = str(tmp_path / "hive")
        spark.range(50).selectExpr("id", "id % 2 AS dt") \
            .write.partitionBy("dt").parquet(d)
        before = parquet_fingerprint(d)
        assert before is not None
        # rewriting a NESTED file must flip the id (a top-level-only
        # listing missed this and could resume a stale manifest)
        nested = None
        for root, _dirs, files in os.walk(d):
            for f in files:
                if f.endswith(".parquet"):
                    nested = os.path.join(root, f)
        os.utime(nested, ns=(time.time_ns(), time.time_ns() + 1))
        assert parquet_fingerprint(d) != before


class TestLoadSource:
    def test_parquet_defaults_to_fingerprint(self, spark, pq_dir):
        df, sid = load_source(spark, pq_dir, fmt="parquet")
        assert df.count() == 100
        assert sid == parquet_fingerprint(pq_dir)

    def test_parquet_caller_snapshot_wins(self, spark, pq_dir):
        _, sid = load_source(spark, pq_dir, fmt="parquet", snapshot_id="snap-x")
        assert sid == "snap-x"

    def test_unknown_format_raises(self, spark, pq_dir):
        with pytest.raises(ValueError, match="unknown input format"):
            load_source(spark, pq_dir, fmt="orc")

    def test_iceberg_gate_is_one_actionable_error(self, spark):
        # this sandbox ships no iceberg-spark-runtime; the branch must
        # refuse with spark-submit guidance, not a JVM stack bomb
        assert not iceberg_available(spark)
        with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
            load_source(spark, "cat.db.webtext", fmt="iceberg")
