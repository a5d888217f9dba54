import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from orc_rust_spark.codecs.block import (
    available_codecs,
    compress_stream,
    decompress_stream,
)
from orc_rust_spark.codecs.float_plain import decode_float, encode_float


def test_float_golden():
    v = np.array([1.0, -2.5, 3.25], dtype=np.float64)
    assert encode_float(v) == v.tobytes()
    assert (decode_float(v.tobytes(), 3) == v).all()
    f32 = np.array([1.5, -0.25], dtype=np.float32)
    assert (decode_float(encode_float(f32), 2, np.float32) == f32).all()


def test_block_header_framing():
    raw = b"a" * 1000  # compressible
    for codec in available_codecs():
        enc = compress_stream(raw, codec)
        assert decompress_stream(enc, codec) == raw
    enc = compress_stream(raw, "zlib")
    header = int.from_bytes(enc[:3], "little")
    assert header & 1 == 0  # compressed
    assert (header >> 1) == len(enc) - 3


def test_block_incompressible_stored_original():
    rng = np.random.default_rng(1)
    raw = rng.integers(0, 256, size=4096, dtype=np.uint8).tobytes()
    enc = compress_stream(raw, "zlib")
    header = int.from_bytes(enc[:3], "little")
    assert header & 1 == 1  # is_original
    assert decompress_stream(enc, "zlib") == raw


def test_multi_block():
    raw = bytes(range(256)) * 4096  # 1 MiB -> 4 blocks of 256 KiB
    enc = compress_stream(raw, "zlib")
    assert decompress_stream(enc, "zlib") == raw


@given(st.binary(min_size=0, max_size=10000))
@settings(max_examples=30, deadline=None)
def test_block_roundtrip(raw):
    for codec in available_codecs():
        assert decompress_stream(compress_stream(raw, codec, block_size=257), codec) == raw
