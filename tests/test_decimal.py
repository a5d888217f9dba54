import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from orc_rust_spark.codecs.decimal_codec import (
    decode_decimal,
    decode_varints_i64,
    encode_decimal,
    encode_varints_i64,
)


def test_varint_stream_shape():
    v = np.array([0, -1, 1, 127, -128, 10**17], dtype=np.int64)
    enc = encode_varints_i64(v)
    assert decode_varints_i64(enc, v.size).tolist() == v.tolist()
    # zigzag(0)=0 -> single byte 0x00
    assert encode_varints_i64(np.array([0], dtype=np.int64)) == b"\x00"
    assert encode_varints_i64(np.array([-1], dtype=np.int64)) == b"\x01"


@given(st.lists(st.integers(-(2**62), 2**62), min_size=0, max_size=800))
@settings(max_examples=40, deadline=None)
def test_varint_roundtrip(vals):
    v = np.array(vals, dtype=np.int64)
    assert decode_varints_i64(encode_varints_i64(v), v.size).tolist() == vals


def test_decimal_rescale():
    # stored at scale 2, read back at scale 4 and 1
    m = np.array([12345, -6789, 0], dtype=np.int64)  # 123.45, -67.89, 0.00
    data, sec = encode_decimal(m, scale=2)
    assert decode_decimal(data, sec, 3, target_scale=2).tolist() == m.tolist()
    assert decode_decimal(data, sec, 3, target_scale=4).tolist() == [1234500, -678900, 0]
    # down-scale truncates toward ZERO (reference fix_i128_scale's i128
    # division): -67.89 at scale 1 is -678, not floor's -679
    assert decode_decimal(data, sec, 3, target_scale=1).tolist() == [1234, -678, 0]


def test_decimal_spark_roundtrip(spark):
    from pyspark.sql import functions as F

    from orc_rust_spark.operators.decode import decode_table_arrow
    from orc_rust_spark.operators.encode import encode_table

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    src = li.select(
        "l_orderkey", "l_linenumber",
        F.col("l_extendedprice").cast("decimal(12,2)").alias("price"),
        F.col("l_discount").cast("decimal(4,2)").alias("disc"),
    )
    chunks = encode_table(src, plan={})
    decoded = decode_table_arrow(chunks, src.schema)
    # (l_orderkey, l_linenumber) is not unique in the synthetic lineitem,
    # so compare as multisets
    assert decoded.exceptAll(src).count() == 0
    assert src.exceptAll(decoded).count() == 0
    assert decoded.count() == src.count()


def test_rescale_i64_overflow_raises():
    """Up-rescaling past int64 must raise (so readers fall back to the
    exact i128 path) instead of silently wrapping — code-review r6."""
    from orc_rust_spark.codecs.decimal_codec import rescale_exact, rescale_i64

    mant = np.array([2**62], dtype=np.int64)
    scales = np.array([0], dtype=np.int64)
    with pytest.raises(ValueError):
        rescale_i64(mant, scales, 5)  # 2**62 * 10**5 >> int64
    # |scale diff| beyond 10**18 wraps np.power itself: must also raise
    with pytest.raises(ValueError):
        rescale_i64(np.array([1], dtype=np.int64),
                    np.array([-19], dtype=np.int64), 0)
    # the exact mirror agrees with the int64 path where both are defined
    got = rescale_exact([123456, -789], np.array([2, 1]), 4)
    assert got == [12345600, -789000]
    want = rescale_i64(np.array([123456, -789], dtype=np.int64),
                       np.array([2, 1], dtype=np.int64), 4)
    assert got == want.tolist()


def test_decode_decimal_v1_secondary_uses_caller_rle():
    """A legacy DIRECT(v1)-encoded decimal stores its SECONDARY scale
    stream as RLEv1 — decode_decimal must honor the caller's decoder
    instead of hard-coding RLEv2 (code-review r6)."""
    from orc_rust_spark.codecs.decimal_codec import encode_varints_i64
    from orc_rust_spark.codecs.rle_v1 import decode_rlev1, encode_rlev1

    mant = np.array([1234, -5, 0, 999999], dtype=np.int64)
    scales = np.full(4, 2, dtype=np.int64)
    data = encode_varints_i64(mant)
    secondary_v1 = encode_rlev1(scales, signed=True)
    got = decode_decimal(data, secondary_v1, 4, 2, rle=decode_rlev1)
    assert got.tolist() == mant.tolist()


def test_decimal_varint_64bit_wrap_raises():
    """A 10-byte varint can hold 70 bits: values past the 64-bit zigzag
    range must raise (exact-path fallback), not wrap mod 2^64
    (code-review r6)."""
    from orc_rust_spark.codecs.decimal_codec import (
        decode_varints_i64,
        encode_varints_exact,
    )

    wide = encode_varints_exact([123 * 10**18])  # > 2^63, exactly 10 bytes
    with pytest.raises(ValueError):
        decode_varints_i64(wide, 1)
    # truncated stream raises ValueError, not IndexError
    ok = encode_varints_exact([1, 2, 3])
    with pytest.raises(ValueError, match="ended early"):
        decode_varints_i64(ok, 10)


def test_rescale_trunc_and_i64min():
    from orc_rust_spark.codecs.decimal_codec import rescale_exact, rescale_i64

    m = np.array([-15, 15, -2**63], dtype=np.int64)
    s2 = np.array([2, 2, 2], dtype=np.int64)
    with pytest.raises(ValueError):  # int64.min cannot rescale in int64
        rescale_i64(m, s2, 1)
    got = rescale_i64(np.array([-15, 15]), np.array([2, 2]), 1)
    assert got.tolist() == [-1, 1]  # trunc toward zero, not floor's -2
    assert rescale_exact([-15, 15], [2, 2], 1) == [-1, 1]
