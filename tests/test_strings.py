import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from orc_rust_spark.codecs.string_codec import (
    decode_string_dict,
    decode_string_direct,
    encode_string_dict,
    encode_string_direct,
)


def test_direct_golden_shape():
    # FIXTURES.md §3 utf8_increase: LENGTH stream should be delta-encoded
    vals = ["a", "bb", "ccc", "dddd", "eeeee"]
    data, lengths = encode_string_direct(vals)
    assert data == b"abbcccddddeeeee"
    assert lengths[0] >> 6 == 0b11  # DELTA header
    out = decode_string_direct(data, lengths, 5)
    assert out.to_pylist() == [v.encode() for v in vals]


def test_direct_empty_strings():
    vals = ["", "x", "", "yy", ""]
    data, lengths = encode_string_direct(vals)
    assert decode_string_direct(data, lengths, 5).to_pylist() == [v.encode() for v in vals]


def test_dict_sorted_symbols():
    vals = ["en", "de", "en", "fr", "en", "de"]
    idx_stream, dict_data, length_stream, size = encode_string_dict(vals)
    assert size == 3
    assert dict_data == b"deenfr"  # sorted symbol table (ORC spec)
    out = decode_string_dict(idx_stream, dict_data, length_stream, 6, size)
    assert out.to_pylist() == [v.encode() for v in vals]


def test_dict_binary_values():
    vals = [b"\x00\xff", b"abc", b"\x00\xff", b""]
    idx_stream, dict_data, length_stream, size = encode_string_dict(pa.array(vals))
    out = decode_string_dict(idx_stream, dict_data, length_stream, 4, size)
    assert out.to_pylist() == vals


@given(st.lists(st.binary(min_size=0, max_size=40), min_size=1, max_size=300))
@settings(max_examples=40, deadline=None)
def test_direct_roundtrip(vals):
    data, lengths = encode_string_direct(pa.array(vals, type=pa.binary()))
    assert decode_string_direct(data, lengths, len(vals)).to_pylist() == vals


@given(st.lists(st.sampled_from([b"en", b"de", b"fr", b"zh", b"", b"xx-Latn"]),
                min_size=1, max_size=500))
@settings(max_examples=40, deadline=None)
def test_dict_roundtrip(vals):
    streams = encode_string_dict(pa.array(vals, type=pa.binary()))
    out = decode_string_dict(streams[0], streams[1], streams[2], len(vals), streams[3])
    assert out.to_pylist() == vals
