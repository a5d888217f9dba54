import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from orc_rust_spark.codecs.rle_v1 import decode_rlev1, encode_rlev1


def test_run_format():
    # [7,7,7,...,7] x100 -> one run header: len-3=97, delta 0, varint base
    v = np.full(100, 7, dtype=np.int64)
    enc = encode_rlev1(v, signed=False)
    assert enc == bytes([97, 0, 7])
    assert decode_rlev1(enc, 100, signed=False).tolist() == [7] * 100


def test_delta_run():
    v = np.arange(10, 20, dtype=np.int64)
    enc = encode_rlev1(v, signed=False)
    assert enc == bytes([7, 1, 10])
    assert decode_rlev1(enc, 10, signed=False).tolist() == list(range(10, 20))


def test_literals():
    v = np.array([2, 300, 5], dtype=np.int64)
    enc = encode_rlev1(v, signed=False)
    assert enc[0] == 256 - 3
    assert decode_rlev1(enc, 3, signed=False).tolist() == [2, 300, 5]


def test_negative_delta_signed():
    v = np.array([100, 90, 80, 70, 60], dtype=np.int64)
    enc = encode_rlev1(v, signed=True)
    assert decode_rlev1(enc, 5, signed=True).tolist() == v.tolist()


@given(st.lists(st.integers(-(2**63), 2**63 - 1), min_size=0, max_size=600))
@settings(max_examples=40, deadline=None)
def test_roundtrip_random(values):
    v = np.array(values, dtype=np.int64)
    enc = encode_rlev1(v, signed=True)
    assert decode_rlev1(enc, v.size, signed=True).tolist() == values


@given(st.lists(st.sampled_from([0, 1, 1, 1, 7, 10**12]), min_size=0, max_size=1000))
@settings(max_examples=30, deadline=None)
def test_roundtrip_runny(values):
    v = np.array(values, dtype=np.int64)
    enc = encode_rlev1(v, signed=False)
    assert decode_rlev1(enc, v.size, signed=False).tolist() == values
