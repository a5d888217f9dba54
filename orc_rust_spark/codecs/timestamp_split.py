"""ORC timestamp split encoding: DATA = seconds since the ORC epoch
(2015-01-01 UTC), SECONDARY = nanoseconds with the trailing-zero trick.

Trailing-zero trick (ORC v1 spec): if the nanosecond value has >= 2 trailing
decimal zeros, ``removed`` (2..8) zeros are stripped and the low 3 bits store
``removed - 1``; otherwise the low 3 bits are 0 and nothing is stripped.

Below-epoch values (r7, liborc writer parity measured on real files):
seconds truncate TOWARD ZERO and the sub-second remainder is stored
SIGNED (same sign as the value) — e.g. -1 us is (secs=0, nanos=-1000).
This is what C++ liborc writes, it round-trips every value exactly
(including the (-1s, 0) range where the floor+ORC-763 convention we used
through r6 decoded +1s off), and every reader that decodes nanos with
arithmetic shifts recovers it through plain modular arithmetic.

The DECODER additionally honors the Java/ORC-763 convention for foreign
files: stored seconds < 0 with nanos > 999_999 adjust seconds - 1
(reference parity: src/encoding/timestamp.rs:121-151;
src/array_decoder/timestamp.rs:51 for the epoch constant). The two
conventions are disjoint on the wire — trunc-written files never pair
negative seconds with positive nanos — so both decode exactly.
"""

from __future__ import annotations

import numpy as np

from .rle_v2 import decode_rlev2, encode_rlev2

NANOS_PER_SECOND = 1_000_000_000
# seconds from 1970-01-01 to 2015-01-01 UTC
ORC_EPOCH_SECONDS = 1_420_070_400


def _trunc_div(ts: np.ndarray, unit: int) -> tuple[np.ndarray, np.ndarray]:
    """(value // unit, value % unit) with C-style truncation toward zero
    (signed remainder) — liborc's writer split, exact for every input."""
    secs = np.floor_divide(ts, np.int64(unit))
    rem = ts - secs * np.int64(unit)
    fixup = (ts < 0) & (rem != 0)
    secs = np.where(fixup, secs + 1, secs)
    return secs, ts - secs * np.int64(unit)


def split_timestamp_ns(ts_ns: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """int64 nanos-since-unix-epoch -> (orc_seconds, encoded_nanos)."""
    ts = np.ascontiguousarray(ts_ns, dtype=np.int64)
    secs, nanos = _trunc_div(ts, NANOS_PER_SECOND)  # nanos in (-1e9, 1e9)
    return _pack_secs_nanos(secs, nanos)


def split_timestamp_us(ts_us: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """int64 MICROS-since-unix-epoch -> (orc_seconds, encoded_nanos).

    The ns-space API caps out at ~year 2262 (us * 1000 wraps int64 —
    code-review r6); ORC's seconds+nanos representation has no such
    limit, so Spark's us-precision timestamps split directly."""
    us = np.ascontiguousarray(ts_us, dtype=np.int64)
    secs, rem = _trunc_div(us, 1_000_000)
    return _pack_secs_nanos(secs, rem * 1000)  # nanos in (-1e9, 1e9)


def _pack_secs_nanos(secs: np.ndarray, nanos: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    stored_secs = secs - ORC_EPOCH_SECONDS

    # trailing decimal zero stripping, vectorized: try removing 8..2 zeros.
    # Works unchanged for SIGNED nanos (liborc convention): an exact
    # multiple has remainder 0 under floored mod too, x << 3 keeps the
    # low 3 bits clear in two's complement, and | sets the zeros code.
    enc = nanos << np.int64(3)
    removed = np.zeros_like(nanos)
    stripped = nanos.copy()
    for r in range(8, 1, -1):
        p = np.int64(10**r)
        hit = (removed == 0) & (nanos != 0) & (nanos % p == 0)
        removed[hit] = r
        stripped[hit] = nanos[hit] // p
    has = removed > 0
    enc[has] = (stripped[has] << np.int64(3)) | (removed[has] - 1)
    return stored_secs, enc


def _unpack_secs_nanos(stored_secs: np.ndarray, enc_nanos: np.ndarray):
    zeros = enc_nanos & np.int64(0x7)
    nanos = enc_nanos >> np.int64(3)
    mult = np.power(10, np.where(zeros != 0, zeros + 1, 0)).astype(np.int64)
    nanos = nanos * mult
    secs = stored_secs + ORC_EPOCH_SECONDS
    secs = np.where((secs < 0) & (nanos > 999_999), secs - 1, secs)
    return secs, nanos


def combine_timestamp_ns(stored_secs: np.ndarray, enc_nanos: np.ndarray) -> np.ndarray:
    """(orc_seconds, encoded_nanos) -> int64 nanos since unix epoch.

    Raises on values outside the int64-ns range (~1677-2262): the multiply
    would otherwise wrap silently, the exact corruption the us-space
    combine was fixed to avoid (code-review r6/r7). The bound is
    conservative by one second at each end."""
    secs, nanos = _unpack_secs_nanos(stored_secs, enc_nanos)
    _check_nanos_range(nanos)
    lim = np.iinfo(np.int64).max // NANOS_PER_SECOND  # 9_223_372_036
    # strict > -lim on the low side: secs == -lim with a negative signed
    # sub-second (liborc convention) would still underflow the multiply
    if secs.size and (int(secs.min()) <= -lim or int(secs.max()) >= lim):
        raise ValueError(
            "ORC timestamp outside the ns-representable range "
            "(~1677-2262); decode with timestamp_unit='us' instead")
    return secs * np.int64(NANOS_PER_SECOND) + nanos


def _check_nanos_range(nanos: np.ndarray) -> None:
    """A decoded sub-second component outside (-1e9, 1e9) can only come
    from a corrupt SECONDARY stream (the encoding's mult is at most 10^8,
    valid writers never store a full second, and liborc's signed
    convention bounds the magnitude the same way) — without this check
    the combine below could wrap int64 silently even with the seconds
    bound in place (code-review r7)."""
    if nanos.size and (int(nanos.min()) < -999_999_999
                       or int(nanos.max()) > 999_999_999):
        raise ValueError(
            "corrupt ORC timestamp SECONDARY stream: sub-second component "
            "outside (-1e9, 1e9)")


def combine_timestamp_us(stored_secs: np.ndarray, enc_nanos: np.ndarray) -> np.ndarray:
    """(orc_seconds, encoded_nanos) -> int64 MICROS since unix epoch.

    Raises on sub-microsecond precision (decoding to Spark's us grid
    would silently alter values); unlike the ns-space combine it does not
    wrap for timestamps past ~year 2262 (code-review r6)."""
    secs, nanos = _unpack_secs_nanos(stored_secs, enc_nanos)
    _check_nanos_range(nanos)
    if nanos.size and int(np.count_nonzero(nanos % 1000)):
        raise ValueError(
            "ORC timestamp has sub-microsecond precision; decoding to "
            "Spark's us-precision timestamps would silently alter values")
    return secs * np.int64(1_000_000) + nanos // 1000


def encode_timestamp(ts_ns: np.ndarray) -> tuple[bytes, bytes]:
    """-> (DATA stream bytes, SECONDARY stream bytes), both RLEv2."""
    secs, nanos = split_timestamp_ns(ts_ns)
    return encode_rlev2(secs, signed=True), encode_rlev2(nanos, signed=False)


def decode_timestamp(data: bytes, secondary: bytes, n: int) -> np.ndarray:
    secs = decode_rlev2(data, n, signed=True)
    nanos = decode_rlev2(secondary, n, signed=False)
    return combine_timestamp_ns(secs, nanos)
