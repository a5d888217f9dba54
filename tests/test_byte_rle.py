import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from orc_rust_spark.codecs.boolean_rle import decode_boolean_rle, encode_boolean_rle
from orc_rust_spark.codecs.byte_rle import decode_byte_rle, encode_byte_rle
from orc_rust_spark.codecs.present import decode_spaced, strip_nulls


def test_byte_rle_run_golden():
    # reference byte.rs:344-347
    assert encode_byte_rle(np.zeros(100, dtype=np.uint8)) == b"\x61\x00"
    assert decode_byte_rle(b"\x61\x00", 100).tolist() == [0] * 100


def test_byte_rle_literals_golden():
    # reference byte.rs:353-355
    assert encode_byte_rle(np.array([0x44, 0x45], dtype=np.uint8)) == b"\xfe\x44\x45"
    assert decode_byte_rle(b"\xfe\x44\x45", 2).tolist() == [0x44, 0x45]


def test_boolean_rle_golden():
    # reference boolean.rs:202-211 and :176-185
    bools = np.array([True] + [False] * 7)
    assert encode_boolean_rle(bools) == b"\xff\x80"
    assert decode_boolean_rle(b"\xff\x80", 8).tolist() == bools.tolist()
    assert encode_boolean_rle(np.zeros(800, dtype=bool)) == b"\x61\x00"
    assert decode_boolean_rle(b"\x61\x00", 800).tolist() == [False] * 800


def test_long_run_chunking():
    v = np.full(1000, 7, dtype=np.uint8)
    enc = encode_byte_rle(v)
    assert decode_byte_rle(enc, 1000).tolist() == v.tolist()


@given(st.lists(st.integers(0, 255), min_size=0, max_size=2000))
@settings(max_examples=60, deadline=None)
def test_byte_rle_roundtrip(values):
    v = np.array(values, dtype=np.uint8)
    enc = encode_byte_rle(v)
    assert decode_byte_rle(enc, len(values)).tolist() == values


@given(st.lists(st.sampled_from([0, 1, 7, 255]), min_size=0, max_size=3000))
@settings(max_examples=40, deadline=None)
def test_byte_rle_runny_roundtrip(values):
    v = np.array(values, dtype=np.uint8)
    assert decode_byte_rle(encode_byte_rle(v), len(values)).tolist() == values


@given(st.lists(st.booleans(), min_size=1, max_size=3000))
@settings(max_examples=60, deadline=None)
def test_boolean_rle_roundtrip(values):
    v = np.array(values, dtype=bool)
    assert decode_boolean_rle(encode_boolean_rle(v), len(values)).tolist() == values


@given(st.lists(st.tuples(st.integers(-1000, 1000), st.booleans()), min_size=1, max_size=500))
@settings(max_examples=40, deadline=None)
def test_present_spacing_roundtrip(pairs):
    vals = np.array([v for v, _ in pairs], dtype=np.int64)
    mask = np.array([m for _, m in pairs], dtype=bool)
    dense = strip_nulls(vals, mask)
    spaced = decode_spaced(dense, mask)
    assert (spaced[mask] == vals[mask]).all()
    assert (spaced[~mask] == 0).all()
