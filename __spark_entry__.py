"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship: full encode->decode roundtrip of the documents
               table through the orc_rust_spark chunk-table engine.
queries()    — one entry per implemented operator family (SURVEY.md §2),
               each (spark, sf_dir) -> DataFrame.
oracle_sql() — DuckDB-equivalent SQL per query. Roundtrip queries have the
               identity oracle: if the engine is lossless, encode->decode
               equals SELECT ... FROM the source table.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _roundtrip(spark: SparkSession, sf_dir: str, table: str, cols: list[str]) -> DataFrame:
    """Encode a testdata table into the chunk-table and decode it back."""
    from orc_rust_spark.operators.decode import decode_table
    from orc_rust_spark.operators.encode import encode_table
    from orc_rust_spark.plans.pipeline import plan_codecs

    src = spark.read.parquet(f"{sf_dir}/{table}.parquet").select(*cols)
    chunks = encode_table(src, plan=plan_codecs(src))
    return decode_table(chunks, src.schema).select(*cols)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: lossless engine roundtrip on sf0.001 documents."""
    return _roundtrip(
        spark, "/root/testdata/sf0.001", "documents",
        ["doc_id", "text", "lang", "source", "n_chars"],
    )


# --- queries -----------------------------------------------------------------


def q_roundtrip_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _roundtrip(spark, sf_dir, "documents",
                      ["doc_id", "text", "lang", "source", "n_chars"])


def q_roundtrip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _roundtrip(spark, sf_dir, "events",
                      ["event_id", "ts", "user_id", "event_type", "value", "props"])


def q_roundtrip_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _roundtrip(
        spark, sf_dir, "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
         "l_returnflag", "l_linestatus", "l_shipdate"],
    )


def q_stats_collection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-statistics collection (reference §2.4 statistics.rs analog)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.agg(
        F.count(F.lit(1)).alias("row_count"),
        F.min("l_orderkey").alias("min_orderkey"),
        F.max("l_orderkey").alias("max_orderkey"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_quantity"),
        F.min("l_shipdate").alias("min_shipdate"),
        F.max("l_shipdate").alias("max_shipdate"),
        F.min("l_returnflag").alias("min_returnflag"),
        F.max("l_returnflag").alias("max_returnflag"),
    )


def q_dictionary_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-size accounting (reference Column::dictionary_size analog)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.agg(
        F.countDistinct("l_returnflag").alias("returnflag_card"),
        F.countDistinct("l_linestatus").alias("linestatus_card"),
        F.countDistinct("l_suppkey").alias("suppkey_card"),
    )


def q_predicate_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-group-pruning analog: selective scan with filter + projection
    pushed to the parquet reader (Catalyst does what row_group_filter.rs
    does in the reference)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.where((F.col("l_quantity") < 5) & (F.col("l_returnflag") == "R"))
        .groupBy("l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("qty"),
        )
        .orderBy("l_linestatus")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "roundtrip_documents": q_roundtrip_documents,
        "roundtrip_events": q_roundtrip_events,
        "roundtrip_lineitem": q_roundtrip_lineitem,
        "stats_collection": q_stats_collection,
        "dictionary_cardinality": q_dictionary_cardinality,
        "predicate_pushdown": q_predicate_pushdown,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "roundtrip_documents":
            "SELECT doc_id, text, lang, source, n_chars FROM documents",
        "roundtrip_events":
            "SELECT event_id, ts, user_id, event_type, value, props FROM events",
        "roundtrip_lineitem":
            "SELECT l_orderkey, l_partkey, l_suppkey, l_quantity, "
            "l_returnflag, l_linestatus, l_shipdate FROM lineitem",
        "stats_collection":
            "SELECT count(*) AS row_count, "
            "min(l_orderkey) AS min_orderkey, max(l_orderkey) AS max_orderkey, "
            "sum(CAST(l_quantity AS BIGINT)) AS sum_quantity, "
            "min(l_shipdate) AS min_shipdate, max(l_shipdate) AS max_shipdate, "
            "min(l_returnflag) AS min_returnflag, max(l_returnflag) AS max_returnflag "
            "FROM lineitem",
        "dictionary_cardinality":
            "SELECT count(DISTINCT l_returnflag) AS returnflag_card, "
            "count(DISTINCT l_linestatus) AS linestatus_card, "
            "count(DISTINCT l_suppkey) AS suppkey_card FROM lineitem",
        "predicate_pushdown":
            "SELECT l_linestatus, count(*) AS cnt, "
            "sum(CAST(l_quantity AS BIGINT)) AS qty FROM lineitem "
            "WHERE l_quantity < 5 AND l_returnflag = 'R' "
            "GROUP BY l_linestatus ORDER BY l_linestatus",
    }
