"""Predicate AST three-valued pruning (reference src/predicate.rs +
src/row_group_filter.rs analog)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from orc_rust_spark.operators.encode import encode_table
from orc_rust_spark.operators.predicate import (
    And,
    Comparison,
    IsNotNull,
    IsNull,
    Not,
    Or,
    prune_chunks_predicate,
    pruned_scan,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
    ]
)


@pytest.fixture(scope="module")
def encoded(spark):
    # 3 range chunks: ids 0-99 (no nulls), 100-199 (some null names), 200-299
    rows = []
    for i in range(300):
        name = None if 100 <= i < 200 and i % 10 == 0 else f"n{i:04d}"
        rows.append((i, name))
    df = spark.createDataFrame(rows, SCHEMA).repartitionByRange(3, "id")
    src = df
    chunks = encode_table(df, plan={}).cache()
    assert chunks.select("part_id", "chunk_ord").distinct().count() == 3
    return src, chunks


def _kept(chunks, pred):
    return prune_chunks_predicate(chunks, pred).count()


def test_and_intersects(spark, encoded):
    _, chunks = encoded
    p = And(Comparison("id", ">=", 120), Comparison("id", "<=", 180))
    assert _kept(chunks, p) == 1


def test_or_unions(spark, encoded):
    _, chunks = encoded
    p = Or(Comparison("id", "<", 50), Comparison("id", ">", 250))
    assert _kept(chunks, p) == 2


def test_not_pushdown(spark, encoded):
    _, chunks = encoded
    # NOT(id < 100) == id >= 100 -> skips the first chunk
    assert _kept(chunks, Not(Comparison("id", "<", 100))) == 2
    # double negation keeps original semantics
    assert _kept(chunks, Not(Not(Comparison("id", "<", 100)))) == 1


def test_is_null_keeps_only_nullable_chunks(spark, encoded):
    _, chunks = encoded
    assert _kept(chunks, IsNull("name")) == 1
    assert _kept(chunks, IsNotNull("name")) == 3


def test_neq_skips_constant_chunk(spark):
    a = [(1, "x")] * 10 + [(2, "y")] * 10
    df = spark.createDataFrame(a, SCHEMA).repartitionByRange(2, "id")
    chunks = encode_table(df, plan={})
    assert _kept(chunks, Comparison("id", "!=", 1)) == 1
    assert _kept(chunks, Comparison("id", "!=", 3)) == 2


def test_string_comparison(spark, encoded):
    _, chunks = encoded
    assert _kept(chunks, Comparison("name", "=", "n0250")) == 1
    assert _kept(chunks, Comparison("name", "<", "n0100")) == 1


def test_pruned_scan_end_to_end(spark, encoded):
    src, chunks = encoded
    pred = And(
        Or(Comparison("id", "<", 20), Comparison("id", ">=", 280)),
        IsNotNull("name"),
    )
    rows, keys = pruned_scan(chunks, SCHEMA, pred)
    got = sorted(r.id for r in rows.collect())
    want = sorted(
        r.id for r in src.where(pred.to_spark()).collect()
    )
    assert got == want and len(got) == 40
    assert keys.count() == 2  # middle chunk pruned
