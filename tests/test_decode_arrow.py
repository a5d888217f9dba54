import pytest
from pyspark.sql import functions as F

from orc_rust_spark.operators.decode import decode_table_arrow
from orc_rust_spark.operators.encode import encode_table
from orc_rust_spark.plans.pipeline import plan_codecs
from orc_rust_spark.sources.webtext import WEBTEXT_SCHEMA, webtext_df


def test_decode_arrow_matches_source(spark):
    df = webtext_df(spark, 2500, num_partitions=3).cache()
    chunks = encode_table(df, plan=plan_codecs(df))
    decoded = decode_table_arrow(chunks, WEBTEXT_SCHEMA)
    s, d = df.alias("s"), decoded.alias("d")
    bad = (
        s.join(d, on="url", how="full")
        .where(
            ~F.col("s.text").eqNullSafe(F.col("d.text"))
            | ~F.col("s.html").eqNullSafe(F.col("d.html"))
            | ~F.col("s.lang").eqNullSafe(F.col("d.lang"))
            | ~F.col("s.warc_ts").eqNullSafe(F.col("d.warc_ts"))
        )
        .count()
    )
    assert bad == 0
    assert decoded.count() == 2500


def test_decode_arrow_testdata_tables(spark):
    for table, cols in [
        ("events", ["event_id", "ts", "user_id", "event_type", "value", "props"]),
        ("documents", ["doc_id", "text", "lang", "source", "n_chars"]),
    ]:
        src = spark.read.parquet(f"/root/testdata/sf0.001/{table}.parquet").select(*cols)
        chunks = encode_table(src, plan={})
        decoded = decode_table_arrow(chunks, src.schema)
        key = cols[0]
        joined = src.alias("s").join(decoded.alias("d"), on=key, how="full")
        cond = None
        for c in cols[1:]:
            ne = ~F.col(f"s.{c}").eqNullSafe(F.col(f"d.{c}"))
            cond = ne if cond is None else (cond | ne)
        assert joined.where(cond).count() == 0, table


def test_encode_parquet_files_roundtrip(spark, tmp_path):
    from orc_rust_spark.operators.encode import encode_parquet_files
    from orc_rust_spark.plans.pipeline import plan_codecs

    src_dir = str(tmp_path / "src")
    df = webtext_df(spark, 1500, num_partitions=3)
    df.write.mode("overwrite").parquet(src_dir)
    src = spark.read.parquet(src_dir)
    chunks = encode_parquet_files(spark, src_dir, plan=plan_codecs(src))
    decoded = decode_table_arrow(chunks, WEBTEXT_SCHEMA)
    joined = src.alias("s").join(decoded.alias("d"), on="url", how="full")
    bad = joined.where(
        ~F.col("s.text").eqNullSafe(F.col("d.text"))
        | ~F.col("s.html").eqNullSafe(F.col("d.html"))
    ).count()
    assert bad == 0 and decoded.count() == 1500
