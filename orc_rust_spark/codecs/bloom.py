"""ORC-compatible Bloom filters (ORC v1 spec, BLOOM_FILTER_UTF8 stream).

Behavioral parity with the reference (src/bloom_filter.rs:97-260):
- bytes are hashed with ORC's Murmur3 hash64 (seed 104729, little-endian
  blocks, x64-128 finalizer)
- i64 values use Thomas Wang's 64-bit mix
- the 64-bit hash splits into two signed 32-bit halves combined as
  h1 + i*h2 for i in 1..k, negatives bit-flipped, modulo bit count
- a cleared bit means definitely-absent; set bits mean maybe-present

The byte-string hash is vectorized across values (transposed block loop +
masked tail), so building a filter over a chunk's url column is a handful
of NumPy passes, not a per-row loop.

Serialization: k (uint32 LE) + bitset words (uint64 LE) — our analog of
the utf8bitset proto field.
"""

from __future__ import annotations

import math

import numpy as np

_C1 = np.uint64(0x87C37B911142_53D5)
_C2 = np.uint64(0x4CF5AD432745_937F)
_M = np.uint64(5)
_N1 = np.uint64(1_390_208_809)
_SEED = np.uint64(104_729)
_MIX1 = np.uint64(0xFF51AFD7ED558CCD)
_MIX2 = np.uint64(0xC4CEB9FE1A85EC53)

DEFAULT_FPP = 0.05


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _fmix64(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> np.uint64(33))
    k = k * _MIX1
    k = k ^ (k >> np.uint64(33))
    k = k * _MIX2
    k = k ^ (k >> np.uint64(33))
    return k


def murmur3_64(data: bytes, offsets: np.ndarray) -> np.ndarray:
    """ORC Murmur3 hash64 of each string in (flat bytes, n+1 offsets)."""
    n = offsets.size - 1
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    # block reads stop at start+8*nblocks-1 and tail reads at
    # start+length-1, both inside the buffer — no padding copy needed
    # (the old concatenate re-copied the whole payload per call;
    # code-review r6)
    buf = np.frombuffer(data, dtype=np.uint8)
    starts = offsets[:-1].astype(np.int64)
    lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
    nblocks = lengths // 8
    h1 = np.full(n, _SEED, dtype=np.uint64)
    max_blocks = int(nblocks.max()) if n else 0
    with np.errstate(over="ignore"):
        for j in range(max_blocks):
            mask = nblocks > j
            pos = starts[mask] + 8 * j
            k1 = (
                buf[pos[:, None] + np.arange(8)]
                .copy()
                .view("<u8")
                .ravel()
                .astype(np.uint64)
            )
            k1 = _rotl(k1 * _C1, 31) * _C2
            hm = h1[mask]
            hm = hm ^ k1
            hm = _rotl(hm, 27) * _M + _N1
            h1[mask] = hm
        # tail: remaining 0-7 bytes, little-endian into k1 (byte 0 lowest)
        tail_len = lengths - nblocks * 8
        tail_pos = starts + nblocks * 8
        k1 = np.zeros(n, dtype=np.uint64)
        for b in range(7):
            mask = tail_len > b
            if not mask.any():
                break
            k1[mask] ^= buf[tail_pos[mask] + b].astype(np.uint64) << np.uint64(8 * b)
        has_tail = tail_len > 0
        kt = _rotl(k1[has_tail] * _C1, 31) * _C2
        h1[has_tail] ^= kt
        h1 ^= lengths.astype(np.uint64)
        return _fmix64(h1)


def wang_hash_i64(values: np.ndarray) -> np.ndarray:
    """Thomas Wang 64-bit mix (ORC's integer bloom hash)."""
    key = values.astype(np.int64, copy=True)
    with np.errstate(over="ignore"):
        key = (~key) + (key << np.int64(21))
        key = key ^ (key.view(np.uint64) >> np.uint64(24)).view(np.int64)
        key = key + (key << np.int64(3)) + (key << np.int64(8))
        key = key ^ (key.view(np.uint64) >> np.uint64(14)).view(np.int64)
        key = key + (key << np.int64(2)) + (key << np.int64(4))
        key = key ^ (key.view(np.uint64) >> np.uint64(28)).view(np.int64)
        key = key + (key << np.int64(31))
    return key.view(np.uint64)


class BloomFilter:
    def __init__(self, num_hash_functions: int, bitset: np.ndarray):
        self.k = max(1, int(num_hash_functions))
        self.bitset = np.ascontiguousarray(bitset, dtype=np.uint64)

    @classmethod
    def for_expected(cls, n: int, fpp: float = DEFAULT_FPP) -> "BloomFilter":
        n = max(1, n)
        m_bits = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
        words = max(1, (m_bits + 63) // 64)
        k = max(1, int(round(words * 64 / n * math.log(2))))
        return cls(k, np.zeros(words, dtype=np.uint64))

    def _bit_indices(self, hashes: np.ndarray) -> np.ndarray:
        """(n, k) bit positions via the ORC double-hash scheme."""
        bit_count = np.int64(self.bitset.size * 64)
        h1 = hashes.astype(np.uint32).view(np.int32).astype(np.int32)
        h2 = (hashes >> np.uint64(32)).astype(np.uint32).view(np.int32).astype(np.int32)
        i = np.arange(1, self.k + 1, dtype=np.int32)
        with np.errstate(over="ignore"):
            combined = h1[:, None] + i[None, :] * h2[:, None]
        combined = np.where(combined < 0, ~combined, combined)
        return combined.astype(np.uint32).astype(np.int64) % bit_count

    def add_hashes(self, hashes: np.ndarray) -> None:
        # boolean scatter + packbits instead of np.bitwise_or.at: the
        # unbuffered per-element scatter was ~10-30x slower on the encode
        # hot path; little-endian packbits viewed as <u8 words matches
        # the bit-i -> word i//64, shift i%64 layout exactly
        # (code-review r6)
        idx = self._bit_indices(hashes).ravel()
        bits = np.zeros(self.bitset.size * 64, dtype=bool)
        bits[idx] = True
        self.bitset |= np.packbits(bits, bitorder="little").view("<u8")

    def test_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Vector of maybe-present booleans."""
        idx = self._bit_indices(hashes)
        words = self.bitset[idx // 64]
        bits = (words >> (idx % 64).astype(np.uint64)) & np.uint64(1)
        return bits.all(axis=1)

    def add_bytes(self, data: bytes, offsets: np.ndarray) -> None:
        self.add_hashes(murmur3_64(data, offsets))

    def might_contain_bytes(self, value: bytes) -> bool:
        h = murmur3_64(value, np.array([0, len(value)], dtype=np.int64))
        return bool(self.test_hashes(h)[0])

    def add_i64(self, values: np.ndarray) -> None:
        self.add_hashes(wang_hash_i64(values))

    def might_contain_i64(self, value: int) -> bool:
        h = wang_hash_i64(np.array([value], dtype=np.int64))
        return bool(self.test_hashes(h)[0])

    def serialize(self) -> bytes:
        return np.uint32(self.k).tobytes() + self.bitset.astype("<u8").tobytes()

    @classmethod
    def deserialize(cls, buf: bytes) -> "BloomFilter":
        k = int(np.frombuffer(buf[:4], dtype="<u4")[0])
        bitset = np.frombuffer(buf[4:], dtype="<u8").copy()
        return cls(k, bitset)
