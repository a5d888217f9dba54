"""RLEv2 golden vectors (ORC v2 spec draft, mirrored from the reference's
unit suite at src/encoding/integer/rle_v2/mod.rs:558-692) + Hypothesis
roundtrips shaped like the reference's proptest strategies."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from orc_rust_spark.codecs.rle_v2 import decode_rlev2, encode_rlev2

U = dict(signed=False)
S = dict(signed=True)


# --- decode goldens ---------------------------------------------------------

def test_short_repeat_decode():
    assert decode_rlev2(bytes([0x0A, 0x27, 0x10]), 5, **U).tolist() == [10000] * 5


def test_direct_decode_unsigned():
    data = bytes([0x5E, 0x03, 0x5C, 0xA1, 0xAB, 0x1E, 0xDE, 0xAD, 0xBE, 0xEF])
    assert decode_rlev2(data, 4, **U).tolist() == [23713, 43806, 57005, 48879]


def test_direct_decode_signed():
    data = bytes([110, 3, 0, 185, 66, 1, 86, 60, 1, 189, 90, 1, 125, 222])
    assert decode_rlev2(data, 4, **S).tolist() == [23713, 43806, 57005, 48879]


def test_delta_decode():
    primes = [2, 3, 5, 7, 11, 13, 17, 19, 23, 29]
    data = bytes([0xC6, 0x09, 0x02, 0x02, 0x22, 0x42, 0x42, 0x46])
    assert decode_rlev2(data, 10, **U).tolist() == primes
    # alternate header (width 3, unaligned) the reader must also accept
    data = bytes([196, 9, 2, 2, 74, 40, 166])
    assert decode_rlev2(data, 10, **U).tolist() == primes


def test_patched_base_decode():
    data = bytes([0x8E, 0x09, 0x2B, 0x21, 0x07, 0xD0, 0x1E, 0x00, 0x14, 0x70,
                  0x28, 0x32, 0x3C, 0x46, 0x50, 0x5A, 0xFC, 0xE8])
    expected = [2030, 2000, 2020, 1000000, 2040, 2050, 2060, 2070, 2080, 2090]
    assert decode_rlev2(data, 10, **U).tolist() == expected


def test_patched_base_decode_alt_widths():
    # same values, wider header variant from the reference reader_test
    data = bytes([102, 9, 0, 126, 224, 7, 208, 0, 126, 79, 66, 64, 0, 127,
                  128, 8, 2, 0, 128, 192, 8, 22, 0, 130, 0, 8, 42])
    expected = [2030, 2000, 2020, 1000000, 2040, 2050, 2060, 2070, 2080, 2090]
    assert decode_rlev2(data, 10, **U).tolist() == expected


def test_mixed_runs_decode():
    data = bytes([2, 1, 64, 5, 80, 1, 1])
    expected = [1, 1, 1, 1, 1, 0, 1, 0, 1, 0, 0, 1, 1, 1, 1]
    assert decode_rlev2(data, 15, **U).tolist() == expected


def test_fixed_run_short_repeat_decode():
    assert decode_rlev2(bytes([7, 1]), 10, **U).tolist() == [1] * 10


def test_patched_base_java_parity_decode():
    data = bytes([
        144, 109, 4, 164, 141, 16, 131, 194, 0, 240, 112, 64, 60, 84, 24, 3, 193, 201, 128,
        120, 60, 33, 4, 244, 3, 193, 192, 224, 128, 56, 32, 15, 22, 131, 129, 225, 0, 112, 84,
        86, 14, 8, 106, 193, 192, 228, 160, 64, 32, 14, 213, 131, 193, 192, 240, 121, 124, 30,
        18, 9, 132, 67, 0, 224, 120, 60, 28, 14, 32, 132, 65, 192, 240, 160, 56, 61, 91, 7, 3,
        193, 192, 240, 120, 76, 29, 23, 7, 3, 220, 192, 240, 152, 60, 52, 15, 7, 131, 129, 225,
        0, 144, 56, 30, 14, 44, 140, 129, 194, 224, 120, 0, 28, 15, 8, 6, 129, 198, 144, 128,
        104, 36, 27, 11, 38, 131, 33, 48, 224, 152, 60, 111, 6, 183, 3, 112, 0, 1, 78, 5, 46,
        2, 1, 1, 141, 3, 1, 1, 138, 22, 0, 65, 1, 4, 0, 225, 16, 209, 192, 4, 16, 8, 36, 16, 3,
        48, 1, 3, 13, 33, 0, 176, 0, 1, 94, 18, 0, 68, 0, 33, 1, 143, 0, 1, 7, 93, 0, 25, 0, 5,
        0, 2, 0, 4, 0, 1, 0, 1, 0, 2, 0, 16, 0, 1, 11, 150, 0, 3, 0, 1, 0, 1, 99, 157, 0, 1,
        140, 54, 0, 162, 1, 130, 0, 16, 112, 67, 66, 0, 2, 4, 0, 0, 224, 0, 1, 0, 16, 64, 16,
        91, 198, 1, 2, 0, 32, 144, 64, 0, 12, 2, 8, 24, 0, 64, 0, 1, 0, 0, 8, 48, 51, 128, 0,
        2, 12, 16, 32, 32, 71, 128, 19, 76,
    ])
    expected = [
        20, 2, 3, 2, 1, 3, 17, 71, 35, 2, 1, 139, 2, 2, 3, 1783, 475, 2, 1, 1, 3, 1, 3, 2, 32,
        1, 2, 3, 1, 8, 30, 1, 3, 414, 1, 1, 135, 3, 3, 1, 414, 2, 1, 2, 2, 594, 2, 5, 6, 4, 11,
        1, 2, 2, 1, 1, 52, 4, 1, 2, 7, 1, 17, 334, 1, 2, 1, 2, 2, 6, 1, 266, 1, 2, 217, 2, 6,
        2, 13, 2, 2, 1, 2, 3, 5, 1, 2, 1, 7244, 11813, 1, 33, 2, -13, 1, 2, 3, 13, 1, 92, 3,
        13, 5, 14, 9, 141, 12, 6, 15, 25, -1, -1, -1, 23, 1, -1, -1, -71, -2, -1, -1, -1, -1,
        2, 1, 4, 34, 5, 78, 8, 1, 2, 2, 1, 9, 10, 2, 1, 4, 13, 1, 5, 4, 4, 19, 5, -1, -1, -1,
        34, -17, -200, -1, -943, -13, -3, 1, 2, -1, -1, 1, 8, -1, 1483, -2, -1, -1, -12751, -1,
        -1, -1, 66, 1, 3, 8, 131, 14, 5, 1, 2, 2, 1, 1, 8, 1, 1, 2, 1, 5, 9, 2, 3, 112, 13, 2,
        2, 1, 5, 10, 3, 1, 1, 13, 2, 3, 4, 1, 3, 1, 1, 2, 1, 1, 2, 4, 2, 207, 1, 1, 2, 4, 3, 3,
        2, 2, 16,
    ]
    assert decode_rlev2(data, len(expected), **S).tolist() == expected


# --- encode goldens (writer heuristic parity) --------------------------------

def test_short_repeat_encode():
    assert encode_rlev2(np.array([10000] * 5), **U) == bytes([0x0A, 0x27, 0x10])


def test_fixed_run_encode():
    assert encode_rlev2(np.array([1] * 10), **U) == bytes([7, 1])


def test_delta_encode():
    primes = np.array([2, 3, 5, 7, 11, 13, 17, 19, 23, 29])
    assert encode_rlev2(primes, **U) == bytes([0xC6, 0x09, 0x02, 0x02, 0x22, 0x42, 0x42, 0x46])


def test_patched_base_encode_golden():
    # reference writer_test_patched_base (rle_v2/mod.rs:559-572)
    vals = np.array([2030, 2000, 2020, 1000000, 2040, 2050, 2060, 2070, 2080, 2090,
                     2100, 2110, 2120, 2130, 2140, 2150, 2160, 2170, 2180, 2190])
    expected = bytes([0x8E, 0x13, 0x2B, 0x21, 0x07, 0xD0, 0x1E, 0x00, 0x14, 0x70, 0x28, 0x32,
                      0x3C, 0x46, 0x50, 0x5A, 0x64, 0x6E, 0x78, 0x82, 0x8C, 0x96, 0xA0, 0xAA,
                      0xB4, 0xBE, 0xFC, 0xE8])
    assert encode_rlev2(vals, **U) == expected


def test_choose_direct_over_patched_base():
    # reference writer_test_choose_direct_over_patched_base (rle_v2/mod.rs:575-585)
    vals = np.array([0, 7, 6, 4, 5, 7, 0, 5, 6, 1, 4, 6, 5, 5, 3, 6, 7, 31, 17, 3])
    expected = bytes([0x4E, 0x13, 0, 7, 6, 4, 5, 7, 0, 5, 6, 1, 4, 6, 5, 5, 3, 6, 7, 31, 17, 3])
    assert encode_rlev2(vals, **U) == expected


def test_mixed_runs_encode():
    # churny data (mean run < 3): the adaptive writer folds short repeats
    # into one packed DIRECT block — still valid RLEv2, smaller than
    # emitting shortrepeat/fixed runs per 3-repeat (4 bytes vs 7 here)
    vals = np.array([1, 1, 1, 1, 1, 0, 1, 0, 1, 0, 0, 1, 1, 1, 1])
    enc = encode_rlev2(vals, **U)
    assert len(enc) <= 7
    assert decode_rlev2(enc, vals.size, signed=False).tolist() == vals.tolist()
    # run-dominated data still gets fixed-run encodings (golden vectors
    # above pin those bytes)
    runs = np.array([5] * 40 + [9] * 40 + [2] * 40)
    enc2 = encode_rlev2(runs, **U)
    assert len(enc2) <= 16
    assert decode_rlev2(enc2, runs.size, signed=False).tolist() == runs.tolist()


# --- roundtrips ---------------------------------------------------------------

def _roundtrip(vals, signed):
    v = np.array(vals, dtype=np.int64)
    enc = encode_rlev2(v, signed=signed)
    out = decode_rlev2(enc, v.size, signed=signed)
    assert out.tolist() == v.tolist()


def test_roundtrip_edges():
    _roundtrip([], True)
    _roundtrip([0], True)
    _roundtrip([-(2**63), 2**63 - 1, 0, -1, 1], True)
    _roundtrip([2**63 - 1] * 600, True)
    _roundtrip(list(range(5000)), True)          # long monotonic -> delta chunks
    _roundtrip(list(range(5000, 0, -1)), True)   # decreasing delta
    _roundtrip([5, 5, 5, 5, 5], True)
    _roundtrip([-5, -5, -5, -5, -5], True)
    _roundtrip([1, 2, None or 3, 4, 5], True)
    _roundtrip([7] * 3000, False)                # fixed-delta chunking >512


def test_roundtrip_planted_outliers():
    rng = np.random.default_rng(42)
    base = rng.integers(2000, 2200, size=512)
    idx = rng.choice(512, size=20, replace=False)
    base[idx] = rng.integers(10**6, 10**7, size=20)
    _roundtrip(base.tolist(), True)
    _roundtrip(base.tolist(), False)
    # outliers needing >31 patch entries must fall back to DIRECT
    many = rng.integers(0, 100, size=512)
    many[rng.choice(512, size=60, replace=False)] = 10**9
    _roundtrip(many.tolist(), True)


@given(st.lists(st.integers(-(2**63), 2**63 - 1), min_size=1, max_size=1000))
@settings(max_examples=60, deadline=None)
def test_roundtrip_random_i64(values):
    _roundtrip(values, True)


@given(st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=1000))
@settings(max_examples=40, deadline=None)
def test_roundtrip_random_u63(values):
    _roundtrip(values, False)


@given(st.lists(st.integers(-100, 100), min_size=1, max_size=2000))
@settings(max_examples=40, deadline=None)
def test_roundtrip_runny_small(values):
    _roundtrip(values, True)


@given(st.lists(st.sampled_from([0, 1, 5, 5, 5, 1000000]), min_size=1, max_size=2000))
@settings(max_examples=40, deadline=None)
def test_roundtrip_biased_runs(values):
    _roundtrip(values, True)


# --- skip (E19) ----------------------------------------------------------------

@given(st.lists(st.integers(-(2**40), 2**40), min_size=1, max_size=1500),
       st.integers(0, 1499))
@settings(max_examples=40, deadline=None)
def test_skip_then_decode_equals_slice(values, skip):
    skip = min(skip, len(values) - 1)
    v = np.array(values, dtype=np.int64)
    enc = encode_rlev2(v, signed=True)
    out = decode_rlev2(enc, v.size - skip, signed=True, skip=skip)
    assert out.tolist() == values[skip:]


def test_skip_across_run_kinds():
    vals = [5] * 8 + list(range(100)) + [7, 1, 9, 2] * 20 + [2000, 2000000] + [3] * 600
    v = np.array(vals, dtype=np.int64)
    enc = encode_rlev2(v, signed=True)
    for skip in (0, 3, 8, 50, 108, 150, 190, 300, 700):
        out = decode_rlev2(enc, len(vals) - skip, signed=True, skip=skip)
        assert out.tolist() == vals[skip:], skip


def test_patched_base_entry_width_rounds_to_fixed_bits():
    """Java/C++ ORC pack the patch list at closestFixedBits(gap+patch):
    a run with gap_width 3 + patch_width 40 = 43 packs at 48. Packing at
    the raw sum silently corrupted every real-ORC interop in both
    directions (code-review r6, differential-tested vs pyarrow's C++
    reader/writer)."""
    import pyarrow as pa
    import pyarrow.orc as paorc

    rng = np.random.default_rng(1)
    v = rng.integers(0, 512, 200).astype(np.int64)
    v[7] = 2**40  # one outlier -> PATCHED_BASE, entry width 43 -> 48
    enc = encode_rlev2(v, signed=True)
    assert np.array_equal(decode_rlev2(enc, v.size, signed=True), v)

    import os
    import tempfile

    from orc_rust_spark.sources.orc_file import orc_to_table, write_orc

    d = tempfile.mkdtemp()
    p = os.path.join(d, "pb.orc")
    write_orc(pa.table({"v": pa.array(v)}), p, compression="none")
    assert paorc.read_table(p).column("v").to_pylist() == v.tolist()

    w = rng.integers(-256, 256, 3000).astype(np.int64)
    w[::517] = 2**50
    p2 = os.path.join(d, "pb2.orc")
    paorc.write_table(pa.table({"v": pa.array(w)}), p2,
                      compression="UNCOMPRESSED")
    assert orc_to_table(p2).column("v").to_pylist() == w.tolist()


def test_patched_base_malformed_stream_raises_value_error():
    """Corrupt patch entries must raise ValueError, not OverflowError /
    IndexError (code-review r6)."""
    rng = np.random.default_rng(3)
    v = rng.integers(0, 512, 200).astype(np.int64)
    v[9] = 2**40
    enc = bytearray(encode_rlev2(v, signed=True))
    assert enc[0] >> 6 == 2  # PATCHED_BASE
    # corrupt the entry's GAP bits (big-endian first byte of the single
    # 48-bit patch entry) so the patch index runs past the run length
    enc[-6] = 0xFF
    with pytest.raises(ValueError):
        decode_rlev2(bytes(enc), v.size, signed=True)


def test_run_extent_n1_delta_consumes_delta_base():
    """Seek parity with _read_delta's old-Hive contract: the delta-base
    varint is present even for a declared run length of 1, so header
    arithmetic must step over it — skipping left next_pos inside the
    varint and the following run parsed as garbage (code-review r7)."""
    import numpy as np

    from orc_rust_spark.codecs.rle_v2 import _run_extent, decode_rlev2

    # delta run n=1 (base 10 zigzag=20, delta-base 0) + a second run
    buf = bytes([0xC0, 0x00, 20, 0]) + bytes([0x0A, 0x00, 0x03])
    n, nxt = _run_extent(buf, 0)
    assert (n, nxt) == (1, 4)
    full = decode_rlev2(buf, 6, signed=True)
    skipped = decode_rlev2(buf, 5, signed=True, skip=1)
    assert np.array_equal(skipped, full[1:])
