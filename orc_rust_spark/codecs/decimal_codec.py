"""ORC decimal encoding (E14): DATA = mantissas as unbounded zigzag
varints, SECONDARY = per-value scale as signed RLEv2; the reader rescales
to the column's fixed scale.

(reference parity: src/encoding/decimal.rs:28-52 decode,
src/array_decoder/decimal.rs:36-123 rescale — the reference is
decode-only here too, like dictionaries; the encode side follows the ORC
v1 spec.)

Varint codec is vectorized for mantissas that fit int64 (covers Spark
DecimalType up to precision 18); wider decimals fall back to exact
Python-int paths per value (they are rare and never in the webtext hot
path).
"""

from __future__ import annotations

import numpy as np

from .rle_v2 import decode_rlev2, encode_rlev2
from .util import zigzag_decode, zigzag_encode

_MAX_BYTES_64 = 10  # 64-bit zigzag needs at most ceil(64/7) = 10 varint bytes


def encode_varints_i64(values: np.ndarray) -> bytes:
    """Vectorized unbounded-varint encode of int64 values (zigzagged)."""
    u = zigzag_encode(np.ascontiguousarray(values, dtype=np.int64))
    n = u.size
    if n == 0:
        return b""
    # 7-bit groups, little-endian
    groups = np.empty((n, _MAX_BYTES_64), dtype=np.uint8)
    tmp = u.copy()
    for j in range(_MAX_BYTES_64):
        groups[:, j] = (tmp & np.uint64(0x7F)).astype(np.uint8)
        tmp >>= np.uint64(7)
    # bytes needed per value = position of highest nonzero group (min 1)
    nonzero = groups != 0
    nbytes = np.where(
        nonzero.any(axis=1),
        _MAX_BYTES_64 - np.argmax(nonzero[:, ::-1], axis=1),
        1,
    ).astype(np.int64)
    keep = np.arange(_MAX_BYTES_64) < nbytes[:, None]
    cont = np.arange(_MAX_BYTES_64) < (nbytes - 1)[:, None]
    groups = groups | (cont.astype(np.uint8) << 7)
    return groups[keep].tobytes()


def decode_varints_i64(buf: bytes, n: int) -> np.ndarray:
    """Vectorized unbounded-varint decode of n zigzagged int64 values."""
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    b = np.frombuffer(buf, dtype=np.uint8)
    is_end = b < 0x80
    ends = np.flatnonzero(is_end)[:n]
    if ends.size < n:
        # clean contract error (the callers' except-ValueError exact-path
        # fallback must see ValueError, not a numpy IndexError —
        # code-review r6)
        raise ValueError(f"varint stream ended early: {ends.size}/{n}")
    starts = np.concatenate(([0], ends[:-1] + 1))
    lens = ends - starts + 1
    if int(lens.max()) > _MAX_BYTES_64:
        raise ValueError("varint wider than 64-bit zigzag range")
    # ragged gather into (n, 10)
    mat = np.zeros((n, _MAX_BYTES_64), dtype=np.uint64)
    mask = np.arange(_MAX_BYTES_64) < lens[:, None]
    mat[mask] = (b[: ends[-1] + 1][np.repeat(starts, lens)
                 + (np.arange(int(lens.sum())) - np.repeat(np.cumsum(lens) - lens, lens))]
                 & 0x7F).astype(np.uint64)
    # a 10-byte varint holds up to 70 bits: values past the 64-bit zigzag
    # range (10th group byte > 1) must raise into the exact i128 path, not
    # silently wrap mod 2^64 (code-review r6)
    wide = lens == _MAX_BYTES_64
    if wide.any() and (mat[wide, _MAX_BYTES_64 - 1] > 1).any():
        raise ValueError("varint wider than 64-bit zigzag range")
    shifts = (np.arange(_MAX_BYTES_64, dtype=np.uint64) * np.uint64(7))[None, :]
    u = (mat << shifts).sum(axis=1, dtype=np.uint64)
    return zigzag_decode(u)


def encode_varints_exact(values: list[int]) -> bytes:
    """Exact unbounded zigzag varints over Python ints — the slow path for
    decimal128 mantissas wider than 64 bits (reference
    src/encoding/decimal.rs:28-52 reads unbounded varints into i128)."""
    out = bytearray()
    for v in values:
        u = (v << 1) ^ (v >> 127)  # arithmetic shift: sign-spread zigzag
        while True:
            b7 = u & 0x7F
            u >>= 7
            if u:
                out.append(b7 | 0x80)
            else:
                out.append(b7)
                break
    return bytes(out)


def decode_varints_exact(buf, n: int) -> list[int]:
    """Exact decode of n unbounded zigzag varints -> Python ints."""
    vals: list[int] = []
    u = 0
    shift = 0
    for byte in bytes(buf):
        u |= (byte & 0x7F) << shift
        if byte & 0x80:
            shift += 7
        else:
            vals.append((u >> 1) ^ -(u & 1))
            if len(vals) == n:
                break
            u = 0
            shift = 0
    if len(vals) != n:
        raise ValueError(f"varint stream ended early: {len(vals)}/{n}")
    return vals


def i128_words(values: list[int]) -> np.ndarray:
    """Python ints -> (n, 2) little-endian two's-complement u64 word pairs
    (the pyarrow decimal128 buffer layout)."""
    words = np.empty((len(values), 2), dtype=np.uint64)
    mask = (1 << 64) - 1
    for i, v in enumerate(values):
        words[i, 0] = v & mask
        words[i, 1] = (v >> 64) & mask
    return words


def encode_decimal(mantissas: np.ndarray, scale: int) -> tuple[bytes, bytes]:
    """-> (DATA varint stream, SECONDARY scale stream). int64 mantissas."""
    data = encode_varints_i64(mantissas)
    scales = np.full(mantissas.size, scale, dtype=np.int64)
    return data, encode_rlev2(scales, signed=True)


def decode_decimal(
    data: bytes, secondary: bytes, n: int, target_scale: int, rle=decode_rlev2
) -> np.ndarray:
    """-> int64 mantissas at target_scale (rescaling like the reference's
    DecimalScaleRepairDecoder when stored scales differ).

    ``rle`` decodes the SECONDARY scale stream — callers reading a legacy
    DIRECT(v1)-encoded column must pass their RLEv1 decoder; the default
    matches DIRECT_V2 and this package's own writer."""
    mantissas = decode_varints_i64(data, n)
    scales = rle(secondary, n, signed=True)
    return rescale_i64(mantissas, scales, target_scale)


def rescale_i64(
    mantissas: np.ndarray, scales: np.ndarray, target_scale: int
) -> np.ndarray:
    """Rescale int64 mantissas from per-value ``scales`` to ``target_scale``,
    raising ValueError whenever the result could exceed int64 (|scale diff|
    beyond 10**18, or an up-scaled mantissa past 2**63-1) so callers fall
    back to the exact Python-int path instead of silently wrapping."""
    diff = target_scale - scales
    if not diff.size or (diff == 0).all():
        return mantissas
    if int(np.abs(diff).max()) > 18:
        raise ValueError("decimal scale diff exceeds int64 power-of-ten range")
    up = diff > 0
    down = diff < 0
    out = mantissas.copy()
    i64_min = np.iinfo(np.int64).min
    if (out[up | down] == i64_min).any():
        # np.abs / negation of int64.min wrap in int64 — exact path
        raise ValueError("decimal rescale overflows int64")
    if up.any():
        pw = np.power(np.int64(10), diff[up])
        if (np.abs(out[up]) > (2**63 - 1) // pw).any():
            raise ValueError("decimal rescale overflows int64")
        out[up] = out[up] * pw
    if down.any():
        # truncate toward ZERO like the reference's i128 division
        # (src/array_decoder/decimal.rs fix_i128_scale: `i / scale_factor`)
        # — floor division gave -6789 @ scale 2 -> 1 as -679 where the
        # reference yields -678 (code-review r6)
        pw = np.power(np.int64(10), -diff[down])
        d = out[down]
        out[down] = np.where(d < 0, -((-d) // pw), d // pw)
    return out


def rescale_exact(ints: list[int], scales, target_scale: int) -> list[int]:
    """Exact Python-int rescale of i128 mantissas to ``target_scale``
    (the slow-path mirror of rescale_i64; down-scale truncates toward
    ZERO, matching the reference's i128 division —
    src/array_decoder/decimal.rs fix_i128_scale)."""
    out = []
    for m, s in zip(ints, scales):
        s = int(s)
        if target_scale >= s:
            out.append(m * 10 ** (target_scale - s))
        else:
            p = 10 ** (s - target_scale)
            q = (-m) // p if m < 0 else m // p
            out.append(-q if m < 0 else q)
    return out
