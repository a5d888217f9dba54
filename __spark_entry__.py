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
    from orc_rust_spark.operators.decode import decode_table_arrow as decode_table
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


def q_roundtrip_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decimal codec roundtrip (E14): varint mantissa + scale streams."""
    from orc_rust_spark.operators.decode import decode_table_arrow
    from orc_rust_spark.operators.encode import encode_table

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    src = li.select(
        "l_orderkey", "l_linenumber",
        F.col("l_extendedprice").cast("decimal(12,2)").alias("price"),
        F.col("l_discount").cast("decimal(4,2)").alias("disc"),
    )
    chunks = encode_table(src, plan={})
    decoded = decode_table_arrow(chunks, src.schema)
    # final cast to double so the DuckDB comparison bridge (which floats
    # decimals) sees identical values; the decimal codec ran either way
    return decoded.select(
        "l_orderkey", "l_linenumber",
        F.col("price").cast("double").alias("price"),
        F.col("disc").cast("double").alias("disc"),
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


# --- training-data pipeline operators ---------------------------------------


def q_text_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from orc_rust_spark.operators.text_analysis import (
        lang_id_col,
        quality_score_col,
        token_count_col,
        fingerprint_col,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = F.col("text")
    return docs.select(
        "doc_id",
        token_count_col(t).alias("n_tokens"),
        quality_score_col(t).alias("quality"),
        lang_id_col(t).alias("lang_guess"),
        fingerprint_col(t).alias("fingerprint"),
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from orc_rust_spark.operators.dedup import exact_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return exact_dedup(docs)


def q_word_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from orc_rust_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.length(F.trim(F.col("text"))) > 0
    )
    # stop-shingle cap keeps the self-join from going quadratic on common
    # words; the oracle applies the identical document-frequency filter
    return ngram_jaccard_pairs(docs, n=1, threshold=0.5, max_df=100)


def q_minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from orc_rust_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.length(F.trim(F.col("text"))) > 0
    )
    return minhash_lsh_pairs(docs, n=2, num_perm=32, bands=8, threshold=0.5)


def q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from orc_rust_spark.operators.dedup import simhash_neardup_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.length(F.trim(F.col("text"))) > 0
    )
    return simhash_neardup_pairs(docs, max_hamming=8)


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from orc_rust_spark.operators.similarity import cosine_topk

    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return cosine_topk(vecs, k=5, round_to=None)


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from orc_rust_spark.operators.similarity import lsh_topk

    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return lsh_topk(vecs, dim=64, k=5, n_planes=8)


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from orc_rust_spark.operators.similarity import embedding_neardup_pairs

    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_neardup_pairs(vecs, tau=0.4).select("id_a", "id_b")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "roundtrip_documents": q_roundtrip_documents,
        "roundtrip_events": q_roundtrip_events,
        "roundtrip_lineitem": q_roundtrip_lineitem,
        "roundtrip_decimal": q_roundtrip_decimal,
        "stats_collection": q_stats_collection,
        "dictionary_cardinality": q_dictionary_cardinality,
        "predicate_pushdown": q_predicate_pushdown,
        "text_analysis": q_text_analysis,
        "dedup_exact": q_dedup_exact,
        "word_jaccard_pairs": q_word_jaccard_pairs,
        "minhash_lsh_neardup": q_minhash_lsh_neardup,
        "simhash_neardup": q_simhash_neardup,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "embedding_neardup": q_embedding_neardup,
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
        "roundtrip_decimal":
            "SELECT l_orderkey, l_linenumber, "
            "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS price, "
            "CAST(CAST(l_discount AS DECIMAL(4,2)) AS DOUBLE) AS disc FROM lineitem",
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
        "text_analysis": r"""
            WITH t AS (
              SELECT doc_id, text, coalesce(text, '') AS ct,
                     string_split_regex(lower(coalesce(text, '')), '\s+') AS toks
              FROM documents
            ), scores AS (
              SELECT doc_id, text, ct, toks,
                len(list_intersect(toks, ['the','and','of','to','in'])) AS s_en,
                len(list_intersect(toks, ['der','die','und','ist','das'])) AS s_de,
                len(list_intersect(toks, ['el','los','que','y','las'])) AS s_es,
                len(list_intersect(toks, ['le','la','et','les','des'])) AS s_fr,
                CASE WHEN length(ct) > 0 THEN
                  (length(ct) - length(regexp_replace(ct, '[^\p{L}\p{N}\s]', '', 'g'))) * 1.0
                   / length(ct)
                ELSE 0.0 END AS punct
              FROM t
            )
            SELECT doc_id,
              CASE WHEN text IS NULL THEN NULL
                   WHEN length(trim(text)) = 0 THEN 0
                   ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
              least(length(ct) / 500.0, 1.0)
                * (1.0 - least(punct * 2.0, 1.0) * 0.5) AS quality,
              CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= 1 THEN 'en'
                   WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= 1 THEN 'de'
                   WHEN s_es >= s_fr AND s_es >= 1 THEN 'es'
                   WHEN s_fr >= 1 THEN 'fr'
                   ELSE 'und' END AS lang_guess,
              md5(regexp_replace(lower(trim(coalesce(text, ''))), '\s+', ' ', 'g'))
                AS fingerprint
            FROM scores
        """,
        "dedup_exact": r"""
            SELECT min(doc_id) AS doc_id,
                   md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
                   count(*) AS dup_count
            FROM documents WHERE text IS NOT NULL
            GROUP BY 2
        """,
        "word_jaccard_pairs": r"""
            WITH x AS (
              SELECT doc_id AS id,
                     unnest(list_distinct(string_split_regex(lower(trim(text)), '\s+'))) AS s
              FROM documents
              WHERE text IS NOT NULL AND length(trim(text)) > 0
            ), kept AS (
              SELECT s FROM x GROUP BY s HAVING count(*) <= 100
            ), e0 AS (
              SELECT x.id, x.s FROM x JOIN kept USING (s)
            ), e AS (
              SELECT id, s, count(*) OVER (PARTITION BY id) AS card FROM e0
            )
            SELECT a.id AS id_a, b.id AS id_b,
                   round(count(*) * 1.0 / (a.card + b.card - count(*)), 6) AS jaccard
            FROM e a JOIN e b ON a.s = b.s AND a.id < b.id
            GROUP BY a.id, b.id, a.card, b.card
            HAVING round(count(*) * 1.0 / (a.card + b.card - count(*)), 6) >= 0.5
        """,
        # minhash_lsh_neardup / simhash_neardup / ann_lsh_topk intentionally
        # have NO SQL oracle: they are hash-seeded approximate operators
        # (xxhash64 / random hyperplanes are not reproducible in DuckDB);
        # the driver records the weaker rows-only check for them.
        "ann_cosine_topk": """
            SELECT vec_id, rank, neighbor_id, cosine FROM (
              SELECT a.vec_id, b.vec_id AS neighbor_id,
                list_sum(list_transform(list_zip(a.embedding, b.embedding),
                         x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
                / (sqrt(list_sum(list_transform(a.embedding,
                          v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
                 * sqrt(list_sum(list_transform(b.embedding,
                          v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))) AS cosine,
                row_number() OVER (
                  PARTITION BY a.vec_id
                  ORDER BY list_sum(list_transform(list_zip(a.embedding, b.embedding),
                             x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
                    / (sqrt(list_sum(list_transform(a.embedding,
                              v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
                     * sqrt(list_sum(list_transform(b.embedding,
                              v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))) DESC,
                    b.vec_id ASC
                ) AS rank
              FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
            ) WHERE rank <= 5
        """,
        "embedding_neardup": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE round(
              list_sum(list_transform(list_zip(a.embedding, b.embedding),
                       x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
              / (sqrt(list_sum(list_transform(a.embedding,
                        v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
               * sqrt(list_sum(list_transform(b.embedding,
                        v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))), 6) >= 0.4
        """,
    }
