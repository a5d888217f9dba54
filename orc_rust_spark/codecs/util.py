"""Low-level integer utilities shared by the RLE codecs.

Implements, vectorized in NumPy, the primitives of the ORC v1 run-length
encodings (public Apache ORC specification):

- zigzag encode/decode            (reference parity: src/encoding/integer/util.rs:475-520)
- unsigned LEB128 varint r/w      (util.rs:522-581)
- big-endian bit-pack/unpack      (util.rs:44-362)
- 5-bit width codes + closest-fixed-bits + aligned widths (util.rs:370-472)
- percentile bit widths over the 32-bucket histogram (util.rs:584-610)

All array kernels take/return NumPy arrays; Python loops only ever run over
*runs* (<=512 values each), never over values.
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64
I64 = np.int64


class CorruptStream(ValueError):
    """A stream is shorter than its own header/metadata promised.

    Distinct type so the stripe-decode corruption guard can wrap it into
    the documented ``ValueError("corrupt ORC stripe ...")`` contract — a
    bare builtins ValueError from np.frombuffer is indistinguishable from
    the engine's own diagnostics (code-review r7)."""


def frombuffer_exact(buf, dtype, count: int, offset: int = 0) -> np.ndarray:
    """np.frombuffer that raises CorruptStream (not numpy's builtins
    ValueError) when ``buf`` is too short for ``count`` items."""
    dt = np.dtype(dtype)
    need = offset + count * dt.itemsize
    if len(buf) < need:
        raise CorruptStream(
            f"truncated stream: need {need} bytes for {count} x {dt}, "
            f"have {len(buf)}")
    return np.frombuffer(buf, dtype=dt, count=count, offset=offset)

# --- zigzag ---------------------------------------------------------------


def zigzag_encode(values: np.ndarray) -> np.ndarray:
    """(v << 1) ^ (v >> 63) with int64 wraparound semantics."""
    v = values.astype(np.int64, copy=False)
    with np.errstate(over="ignore"):
        return ((v << np.int64(1)) ^ (v >> np.int64(63))).view(np.uint64)


def zigzag_decode(values: np.ndarray) -> np.ndarray:
    u = values.astype(np.uint64, copy=False)
    return ((u >> np.uint64(1)) ^ (-(u & np.uint64(1)).astype(np.int64)).view(np.uint64)).view(
        np.int64
    )


def zigzag_encode_scalar(v: int) -> int:
    v &= (1 << 64) - 1
    sv = v - (1 << 64) if v >= 1 << 63 else v
    return ((sv << 1) ^ (sv >> 63)) & ((1 << 64) - 1)


def zigzag_decode_scalar(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


# --- varint (unsigned LEB128) ----------------------------------------------


def write_varint(value: int) -> bytes:
    """Unsigned base-128 varint of a Python int (0 <= value < 2**64)."""
    if value < 0:
        raise ValueError("varint value must be non-negative")
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def read_varint(buf, pos: int) -> tuple[int, int]:
    """Read one unsigned varint from ``buf`` at ``pos`` -> (value, new_pos)."""
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def write_signed_varint(value: int) -> bytes:
    """Zigzag + varint (ORC 'signed varint')."""
    return write_varint(zigzag_encode_scalar(value))


def read_signed_varint(buf, pos: int) -> tuple[int, int]:
    u, pos = read_varint(buf, pos)
    return zigzag_decode_scalar(u), pos


# --- bit widths -------------------------------------------------------------

# ORC FixedBitSizes: 1..24, 26, 28, 30, 32, 40, 48, 56, 64 (32 entries).
_FIXED_BITS = list(range(1, 25)) + [26, 28, 30, 32, 40, 48, 56, 64]
_FIXED_BITS_ARR = np.array(_FIXED_BITS, dtype=np.int64)
# width -> 5-bit code (code i encodes width _FIXED_BITS[i])
_WIDTH_TO_CODE = {w: i for i, w in enumerate(_FIXED_BITS)}
# aligned widths used by DIRECT packing
_ALIGNED = np.array([1, 2, 4, 8, 16, 24, 32, 40, 48, 56, 64], dtype=np.int64)


# 0..64 -> rounded-up size, as plain-int lookup tables (these sit inside
# the per-run RLEv2 selector; a numpy searchsorted per scalar was ~25% of
# churny-int encode time in aggregate)
_FIXED_LUT = [1] + [
    next(w for w in _FIXED_BITS if w >= n) for n in range(1, 65)
]
_ALIGNED_LUT = [1] + [
    next(int(w) for w in _ALIGNED.tolist() if w >= n) for n in range(1, 65)
]


def closest_fixed_bits(n: int) -> int:
    """Round a bit width up to the nearest ORC fixed-bit size (min 1)."""
    if n <= 1:
        return 1
    return _FIXED_LUT[n]


def closest_aligned_bits(n: int) -> int:
    """Round a bit width up to the nearest byte-aligned-friendly size."""
    if n <= 1:
        return 1
    return _ALIGNED_LUT[n]


def encode_bit_width(width: int) -> int:
    """Width -> 5-bit header code (width must be a fixed-bit size)."""
    return _WIDTH_TO_CODE[closest_fixed_bits(width)]


def decode_bit_width(code: int) -> int:
    """5-bit header code -> width."""
    return _FIXED_BITS[code]


_POW2_U64 = (np.uint64(1) << np.arange(64, dtype=np.uint64))


def bits_required(values: np.ndarray) -> np.ndarray:
    """Per-element minimal bit width of uint64 values (0 -> 1), exact.

    One binary search per element against the 64 powers of two
    (``bit_length(u)`` = count of powers <= u) — exact across the full
    64-bit range (float log2 would not be above 2**53) and a single
    numpy call, so the per-call overhead stays ~8 us on the 512-value
    runs the RLEv2 selector feeds it (the earlier unpackbits matrix was
    ~160x slower; a 6-pass branchless shift still paid 5x in dispatch).
    """
    u = np.ascontiguousarray(values, dtype=np.uint64)
    if u.size == 0:
        return np.zeros(0, dtype=np.int64)
    return np.maximum(
        np.searchsorted(_POW2_U64, u, side="right"), 1
    ).astype(np.int64)


def bits_required_scalar(v: int) -> int:
    return max(1, int(v).bit_length())


def percentile_bits(values_u64: np.ndarray, p: float,
                    widths: np.ndarray | None = None) -> int:
    """Smallest fixed-bit width covering the p-th percentile of widths.

    Mirrors the ORC writer's histogram walk: per-value widths are first
    rounded to fixed-bit sizes, then we scan the histogram from the widest
    bucket down, subtracting counts from ``len * (1 - p)``; the first bucket
    that overdraws is the answer. ``widths`` may carry precomputed
    ``bits_required(values_u64)`` (hot callers compute them once per
    array, not once per 512-value run).
    """
    if values_u64.size == 0:
        return 1
    if widths is None:
        widths = bits_required(values_u64)
    return _hist_walk(_width_hist(widths), values_u64.size, p)


def percentile_bits_pair(
    values_u64: np.ndarray, p_hi: float, p_lo: float,
    widths: np.ndarray | None = None,
) -> tuple[int, int]:
    """(percentile_bits(p_hi), percentile_bits(p_lo)) from ONE histogram
    build — the RLEv2 selector always needs two percentiles of the same
    run, and the bincount dominates the per-run cost."""
    if values_u64.size == 0:
        return 1, 1
    if widths is None:
        widths = bits_required(values_u64)
    hist = _width_hist(widths)
    n = values_u64.size
    return _hist_walk(hist, n, p_hi), _hist_walk(hist, n, p_lo)


def _width_hist(widths: np.ndarray) -> list[int]:
    idx = np.searchsorted(_FIXED_BITS_ARR, widths, side="left")
    return np.bincount(idx, minlength=32).tolist()  # plain ints: the walk
    # below runs twice per selector probe and np scalars cost 3x


def _hist_walk(hist: list[int], n: int, p: float) -> int:
    # scan from the widest fixed-bit bucket down, subtracting counts
    # from the allowance n * (1 - p); the first overdraw is the answer
    per_len = int(n * (1.0 - p))
    for i in range(31, -1, -1):
        per_len -= hist[i]
        if per_len < 0:
            return _FIXED_BITS[i]
    return 1


# --- big-endian bit packing --------------------------------------------------


def bitpack(values: np.ndarray, width: int) -> bytes:
    """Pack uint64 values MSB-first at ``width`` bits each, zero-padded tail."""
    if width == 0 or values.size == 0:
        return b""
    u = np.ascontiguousarray(values, dtype=np.uint64)
    if width == 8:
        return u.astype(np.uint8).tobytes()
    if width == 16:
        return u.astype(">u2").tobytes()
    if width == 32:
        return u.astype(">u4").tobytes()
    if width == 64:
        return u.astype(">u8").tobytes()
    # general path: full 64-bit big-endian bit matrix, slice low `width` bits
    bits = np.unpackbits(u.view(np.uint8).reshape(-1, 8)[:, ::-1], axis=1)
    return np.packbits(bits[:, 64 - width :]).tobytes()


def bitunpack(buf, n: int, width: int) -> np.ndarray:
    """Unpack ``n`` uint64 values packed MSB-first at ``width`` bits each."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    raw = frombuffer_exact(buf, np.uint8, (n * width + 7) // 8)
    if width == 8:
        return raw[:n].astype(np.uint64)
    if width == 16:
        return raw[: 2 * n].view(">u2").astype(np.uint64)
    if width == 32:
        return raw[: 4 * n].view(">u4").astype(np.uint64)
    if width == 64:
        return raw[: 8 * n].view(">u8").astype(np.uint64)
    bits = np.unpackbits(raw)[: n * width].reshape(n, width)
    full = np.zeros((n, 64), dtype=np.uint8)
    full[:, 64 - width :] = bits
    return np.packbits(full, axis=1)[:, ::-1].copy().view(np.uint64).ravel()


def int32_offsets(lengths) -> "pa.Array":
    """Arrow int32 offsets buffer from per-value lengths (shared by the
    chunk decoder and the real-ORC reader's list/map assembly)."""
    import pyarrow as pa

    lengths = np.asarray(lengths, dtype=np.int64)
    total = int(lengths.sum()) if lengths.size else 0
    if total > 2**31 - 1:
        raise OverflowError("list child count exceeds int32 offsets")
    offsets = np.zeros(lengths.size + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:])
    return pa.array(offsets, type=pa.int32())
