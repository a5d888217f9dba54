import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from orc_rust_spark.codecs.bloom import (
    BloomFilter,
    murmur3_64,
    wang_hash_i64,
)


def _murmur3_64_ref(data: bytes) -> int:
    """Direct scalar transcription of the ORC Java Murmur3 hash64 semantics
    (public algorithm) to validate the vectorized version."""
    C1 = 0x87C37B91114253D5
    C2 = 0x4CF5AD432745937F
    MASK = (1 << 64) - 1

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & MASK

    h1 = 104729
    nblocks = len(data) // 8
    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 8 : i * 8 + 8], "little")
        k1 = (k1 * C1) & MASK
        k1 = rotl(k1, 31)
        k1 = (k1 * C2) & MASK
        h1 ^= k1
        h1 = rotl(h1, 27)
        h1 = (h1 * 5 + 1390208809) & MASK
    tail = data[nblocks * 8 :]
    k1 = 0
    for i in range(len(tail) - 1, -1, -1):
        k1 ^= tail[i] << (8 * i)
    if tail:
        k1 = (k1 * C1) & MASK
        k1 = rotl(k1, 31)
        k1 = (k1 * C2) & MASK
        h1 ^= k1
    h1 ^= len(data)
    h1 ^= h1 >> 33
    h1 = (h1 * 0xFF51AFD7ED558CCD) & MASK
    h1 ^= h1 >> 33
    h1 = (h1 * 0xC4CEB9FE1A85EC53) & MASK
    h1 ^= h1 >> 33
    return h1


def _wang_ref(v: int) -> int:
    M = (1 << 64) - 1

    def s(x):  # to signed 64
        x &= M
        return x - (1 << 64) if x >= 1 << 63 else x

    key = v
    key = s(~key + (key << 21))
    key = s(key ^ ((key & M) >> 24))
    key = s(key + (key << 3) + (key << 8))
    key = s(key ^ ((key & M) >> 14))
    key = s(key + (key << 2) + (key << 4))
    key = s(key ^ ((key & M) >> 28))
    key = s(key + (key << 31))
    return key & M


@given(st.lists(st.binary(min_size=0, max_size=40), min_size=1, max_size=50))
@settings(max_examples=40, deadline=None)
def test_murmur3_matches_reference_scalar(strings):
    data = b"".join(strings)
    off = np.zeros(len(strings) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in strings], out=off[1:])
    got = murmur3_64(data, off)
    expect = [_murmur3_64_ref(s) for s in strings]
    assert got.tolist() == expect


@given(st.lists(st.integers(-(2**63), 2**63 - 1), min_size=1, max_size=100))
@settings(max_examples=40, deadline=None)
def test_wang_hash_matches_reference_scalar(values):
    got = wang_hash_i64(np.array(values, dtype=np.int64))
    assert got.tolist() == [_wang_ref(v) for v in values]


def test_bloom_no_false_negatives_bytes():
    urls = [f"https://h{i}.example.com/{i}".encode() for i in range(2000)]
    data = b"".join(urls)
    off = np.zeros(len(urls) + 1, dtype=np.int64)
    np.cumsum([len(u) for u in urls], out=off[1:])
    bf = BloomFilter.for_expected(len(urls), fpp=0.05)
    bf.add_bytes(data, off)
    for u in urls[::97]:
        assert bf.might_contain_bytes(u)
    # false positive rate sanity
    misses = sum(
        bf.might_contain_bytes(f"https://absent-{i}.example.com/x".encode())
        for i in range(1000)
    )
    assert misses < 150  # ~5% target, generous bound


def test_bloom_i64_and_serialization():
    vals = np.arange(0, 100000, 7, dtype=np.int64)
    bf = BloomFilter.for_expected(vals.size)
    bf.add_i64(vals)
    clone = BloomFilter.deserialize(bf.serialize())
    assert clone.k == bf.k
    assert clone.might_contain_i64(7 * 777)
    assert (clone.test_hashes(wang_hash_i64(vals)) == True).all()  # noqa: E712
    absent = np.array([3, 5, 11, 9999999], dtype=np.int64)
    fp = clone.test_hashes(wang_hash_i64(absent)).sum()
    assert fp <= 2
