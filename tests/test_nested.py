"""Nested types (list/struct/map), Date, decimal128>18, int8 byte-RLE —
chunk-level roundtrips (reference src/array_decoder/{list,struct_decoder,
map}.rs, schema.rs:529, decimal.rs, writer/stripe.rs:178 analogs)."""

import datetime
import decimal

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import types as T

from orc_rust_spark.operators.decode import decode_chunk_arrays
from orc_rust_spark.operators.encode import encode_chunk


def _roundtrip(tbl: pa.Table, col_types: dict):
    batch = encode_chunk(tbl, part_id=0, chunk_ord=0, plan={})
    return decode_chunk_arrays(batch.to_pylist(), col_types)


def test_list_of_floats_roundtrip():
    rng = np.random.default_rng(7)
    vals = [rng.standard_normal(rng.integers(0, 9)).astype(np.float32) for _ in range(500)]
    arr = pa.array([v.tolist() for v in vals], type=pa.list_(pa.float32()))
    out = _roundtrip(pa.table({"emb": arr}), {"emb": T.ArrayType(T.FloatType())})
    assert out["emb"].cast(pa.list_(pa.float32())).equals(arr)


def test_list_with_null_lists_and_null_items():
    data = [[1, 2, None], None, [], [5], None, [None, None], [7, 8, 9]]
    arr = pa.array(data, type=pa.list_(pa.int64()))
    out = _roundtrip(pa.table({"xs": arr}), {"xs": T.ArrayType(T.LongType())})
    assert out["xs"].cast(pa.list_(pa.int64())).to_pylist() == data


def test_struct_roundtrip_with_nulls():
    data = [
        {"a": 1, "b": "x"}, None, {"a": None, "b": "y"},
        {"a": 3, "b": None}, {"a": 4, "b": "zz"},
    ]
    arr = pa.array(data, type=pa.struct([("a", pa.int64()), ("b", pa.string())]))
    st = T.StructType([T.StructField("a", T.LongType()), T.StructField("b", T.StringType())])
    out = _roundtrip(pa.table({"s": arr}), {"s": st})
    assert out["s"].to_pylist() == data


def test_map_roundtrip():
    data = [[("k1", 1), ("k2", 2)], None, [], [("k9", None)], [("a", 5)]]
    arr = pa.array(data, type=pa.map_(pa.string(), pa.int64()))
    mt = T.MapType(T.StringType(), T.LongType())
    out = _roundtrip(pa.table({"m": arr}), {"m": mt})
    assert out["m"].to_pylist() == [
        None if d is None else list(d) for d in data
    ] or out["m"].cast(pa.map_(pa.string(), pa.int64())).to_pylist() == data


def test_list_of_struct_roundtrip():
    data = [[{"q": 1}], None, [{"q": None}, {"q": 3}], []]
    arr = pa.array(data, type=pa.list_(pa.struct([("q", pa.int64())])))
    dt = T.ArrayType(T.StructType([T.StructField("q", T.LongType())]))
    out = _roundtrip(pa.table({"ls": arr}), {"ls": dt})
    assert out["ls"].to_pylist() == data


def test_date_roundtrip():
    days = [datetime.date(1900, 1, 1), datetime.date(1970, 1, 1), None,
            datetime.date(2038, 1, 19), datetime.date(2024, 2, 29)]
    arr = pa.array(days, type=pa.date32())
    out = _roundtrip(pa.table({"d": arr}), {"d": T.DateType()})
    assert out["d"].cast(pa.date32()).to_pylist() == days


def test_decimal38_roundtrip_wide_mantissas():
    big = decimal.Decimal("12345678901234567890123456789012.345678")
    vals = [big, -big, decimal.Decimal("0.000001"), None,
            decimal.Decimal("-99999999999999999999.999999")]
    arr = pa.array(vals, type=pa.decimal128(38, 6))
    out = _roundtrip(pa.table({"x": arr}), {"x": T.DecimalType(38, 6)})
    assert out["x"].cast(pa.decimal128(38, 6)).to_pylist() == vals


def test_decimal38_small_mantissas_use_fast_path():
    # precision 38 but values fit int64: must still roundtrip (fast path)
    vals = [decimal.Decimal("1.50"), decimal.Decimal("-2.25"), decimal.Decimal("0")]
    arr = pa.array(vals, type=pa.decimal128(38, 2))
    out = _roundtrip(pa.table({"x": arr}), {"x": T.DecimalType(38, 2)})
    assert out["x"].cast(pa.decimal128(38, 2)).to_pylist() == vals


def test_int8_byte_rle_roundtrip():
    vals = [1, 1, 1, -128, 127, None, 0, 5, 5, 5, 5]
    arr = pa.array(vals, type=pa.int8())
    batch = encode_chunk(pa.table({"b": arr}), 0, 0, {})
    codecs = {r["codec"] for r in batch.to_pylist() if r["column"] == "b"
              and r["stream_kind"] == "DATA"}
    assert codecs == {"byte_rle"}
    out = decode_chunk_arrays(batch.to_pylist(), {"b": T.ByteType()})
    assert out["b"].cast(pa.int8()).to_pylist() == vals


@pytest.mark.parametrize("n", [0, 1, 3])
def test_empty_and_tiny_lists(n):
    data = [[float(i)] * i for i in range(n)]
    arr = pa.array(data, type=pa.list_(pa.float64()))
    out = _roundtrip(pa.table({"xs": arr}), {"xs": T.ArrayType(T.DoubleType())})
    assert out["xs"].cast(pa.list_(pa.float64())).to_pylist() == data
