import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from orc_rust_spark.codecs import util


def test_varint_golden():
    # FIXTURES.md §2 varint table (reference util.rs:770-788)
    cases = [(0, b"\x00"), (127, b"\x7f"), (128, b"\x80\x01"),
             (16383, b"\xff\x7f"), (16384, b"\x80\x80\x01")]
    for value, enc in cases:
        assert util.write_varint(value) == enc
        got, pos = util.read_varint(enc, 0)
        assert got == value and pos == len(enc)


def test_zigzag_golden():
    # reference util.rs:622-654
    vals = np.array([0, -1, 1, -2, 2, 2**63 - 1, -(2**63)], dtype=np.int64)
    enc = util.zigzag_encode(vals)
    assert enc.tolist() == [0, 1, 2, 3, 4, 2**64 - 2, 2**64 - 1]
    assert (util.zigzag_decode(enc) == vals).all()
    assert util.zigzag_encode_scalar(-1) == 1
    assert util.zigzag_decode_scalar(2**64 - 1) == -(2**63)


def test_bit_width_tables():
    assert util.closest_fixed_bits(0) == 1
    assert util.closest_fixed_bits(5) == 5
    assert util.closest_fixed_bits(25) == 26
    assert util.closest_fixed_bits(33) == 40
    assert util.closest_fixed_bits(57) == 64
    assert util.closest_aligned_bits(3) == 4
    assert util.closest_aligned_bits(12) == 16
    assert util.decode_bit_width(util.encode_bit_width(24)) == 24
    assert util.decode_bit_width(0) == 1
    assert util.decode_bit_width(31) == 64


def test_bits_required_exact_above_2_53():
    v = np.array([0, 1, 2**53 + 1, 2**63, 2**64 - 1], dtype=np.uint64)
    assert util.bits_required(v).tolist() == [1, 1, 54, 64, 64]


def test_percentile_bits():
    # 20 values, one 20-bit outlier -> 95p is 8 bits, 100p is 20 bits
    v = np.array([30, 0, 20, 998000] + list(range(40, 200, 10)), dtype=np.uint64)
    assert util.percentile_bits(v, 1.0) == 20
    assert util.percentile_bits(v, 0.95) == 8


@given(st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=200),
       st.integers(1, 64))
@settings(max_examples=50, deadline=None)
def test_bitpack_roundtrip(values, width):
    mask = (1 << width) - 1
    vals = np.array([v & mask for v in values], dtype=np.uint64)
    packed = util.bitpack(vals, width)
    assert len(packed) == (len(vals) * width + 7) // 8
    out = util.bitunpack(packed, len(vals), width)
    assert out.tolist() == vals.tolist()


@given(st.lists(st.integers(-(2**63), 2**63 - 1), min_size=1, max_size=100))
@settings(max_examples=50, deadline=None)
def test_zigzag_roundtrip(values):
    v = np.array(values, dtype=np.int64)
    assert (util.zigzag_decode(util.zigzag_encode(v)) == v).all()


@given(st.integers(0, 2**64 - 1))
@settings(max_examples=100, deadline=None)
def test_varint_roundtrip(value):
    got, _ = util.read_varint(util.write_varint(value), 0)
    assert got == value


def test_frombuffer_exact_truncation_is_corrupt_stream():
    """Truncated streams raise the engine's CorruptStream (a ValueError
    subclass the stripe guard wraps into the corrupt-file contract), not
    numpy's bare builtins ValueError (code-review r7)."""
    import pytest

    from orc_rust_spark.codecs.util import CorruptStream, frombuffer_exact

    with pytest.raises(CorruptStream, match="truncated stream"):
        frombuffer_exact(b"\x01\x02", np.int64, 1)
    with pytest.raises(CorruptStream, match="truncated stream"):
        frombuffer_exact(b"\x00" * 4, np.uint8, 2, offset=3)
    out = frombuffer_exact(b"\x01\x00\x02\x00", "<u2", 2)
    assert out.tolist() == [1, 2]
