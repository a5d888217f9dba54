"""The checksum-aggregate gate helpers in __spark_entry__ must stay
mirror-exact between the Spark side (_mix_aggs) and the DuckDB oracle
side (_mix_sql) — VERDICT r6 wrong #2 found _mix_sql hardcoded
``l_orderkey`` as the mix key, which would silently build wrong oracle
SQL for the first non-lineitem caller. These tests pin the parity on a
NON-lineitem table (events, key = event_id) and byte-pin the four
existing lineitem gates' SQL against the pre-parameterization output."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


def test_mix_sql_matches_mix_aggs_on_non_lineitem_table(spark):
    """Spark _mix_aggs over events keyed on event_id must equal DuckDB
    running _mix_sql(key='event_id') on the same parquet."""
    from pyspark.sql import functions as F

    path = os.path.join(SF_DIR, "events.parquet")
    if not os.path.exists(path):
        pytest.skip("testdata missing")

    df = (spark.read.parquet(path)
          .groupBy("event_type")
          .agg(*entry_mod._mix_aggs(F.col("event_id"), {
              "eid": F.col("event_id"),
              "uid": F.col("user_id"),
              "val": F.floor(F.col("value") * 100),
          }))
          .orderBy("event_type"))
    got = [tuple(r) for r in df.collect()]

    sql = entry_mod._mix_sql(
        "event_type",
        {"eid": "event_id", "uid": "user_id", "val": "floor(value * 100)"},
        f"read_parquet('{path}')",
        key="event_id",
    ) + " ORDER BY event_type"
    want = duckdb.sql(sql).fetchall()
    assert got == want


def test_mix_sql_default_key_is_byte_identical_to_r6_gates():
    """The four committed lineitem gates call _mix_sql without a key;
    the default must produce SQL equivalent to the r6 (pre-parameter)
    rendering so their oracle hashes cannot shift. The only textual
    delta allowed is the parenthesization of the key expression."""
    sql = entry_mod._mix_sql("rf", {"ok": "l_orderkey"}, "lineitem",
                             group_inner="l_returnflag AS rf")
    assert f"CAST((l_orderkey) % {entry_mod._MIX_P1} AS BIGINT) AS k1" in sql
    assert f"CAST((l_orderkey) % {entry_mod._MIX_P2} AS BIGINT) AS k2" in sql
    # and DuckDB still parses/executes it against a real lineitem
    path = os.path.join(SF_DIR, "lineitem.parquet")
    if not os.path.exists(path):
        pytest.skip("testdata missing")
    rows = duckdb.sql(
        entry_mod._mix_sql("rf", {"ok": "l_orderkey"},
                           f"read_parquet('{path}')",
                           group_inner="l_returnflag AS rf")).fetchall()
    assert rows and all(len(r) == 5 for r in rows)
