"""ORC Byte RLE (public ORC v1 spec).

Format: header byte h
- 0x00..0x7F : a run — the next byte repeats (h + 3) times (3..130)
- 0x80..0xFF : literals — the next (256 - h) bytes verbatim (1..128)

Encoder semantics mirror the reference state machine
(reference parity: src/encoding/byte.rs:34-321): runs of >= 3 identical
bytes become run headers (chunked at 130), everything else accumulates
into literal groups (chunked at 128). Run detection is vectorized via
np.diff; the Python loop is over *runs*, not bytes.
"""

from __future__ import annotations

import numpy as np

from .util import frombuffer_exact

MIN_REPEAT = 3
MAX_RUN = 130
MAX_LITERALS = 128


def _run_lengths(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(run_start_indices, run_lengths) of maximal equal-value runs."""
    n = values.size
    if n == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    change = np.flatnonzero(values[1:] != values[:-1]) + 1
    starts = np.concatenate(([0], change))
    lengths = np.diff(np.concatenate((starts, [n])))
    return starts, lengths


def encode_byte_rle(values: np.ndarray) -> bytes:
    """Encode a uint8 array.

    The Python loop visits only REPEAT runs (>= MIN_REPEAT) — churny data
    has few of them, so literal-dominant input costs len/128 iterations,
    not one per value-change (the r3 fix: the per-run loop made a random
    int8 column encode at ~1 MB/s single-thread)."""
    v = np.ascontiguousarray(values, dtype=np.uint8)
    out = bytearray()

    def emit_literals(a: int, b: int) -> None:
        while a < b:
            take = min(b - a, MAX_LITERALS)
            out.append(256 - take)
            out.extend(v[a : a + take].tobytes())
            a += take

    starts, lengths = _run_lengths(v)
    rep = lengths >= MIN_REPEAT
    prev_end = 0
    for s, ln in zip(starts[rep].tolist(), lengths[rep].tolist()):
        emit_literals(prev_end, s)
        byte = int(v[s])
        remaining = ln
        while remaining >= MIN_REPEAT:
            take = min(remaining, MAX_RUN)
            out.append(take - MIN_REPEAT)
            out.append(byte)
            remaining -= take
        if remaining:  # 1-2 leftover after 130-chunking -> literals
            emit_literals(s + ln - remaining, s + ln)
        prev_end = s + ln
    emit_literals(prev_end, v.size)
    return bytes(out)


def decode_byte_rle(buf, n: int, exact: bool = True) -> np.ndarray:
    """Decode ``n`` bytes from a Byte-RLE stream. ``exact=False`` tolerates
    a stream continuing past ``n`` (mid-stream row-group seek decode)."""
    out = np.empty(n, dtype=np.uint8)
    got = 0
    pos = 0
    while got < n:
        h = buf[pos]
        pos += 1
        if h < 0x80:
            ln = h + MIN_REPEAT
            out[got : got + ln] = buf[pos]
            pos += 1
        else:
            ln = 256 - h
            take = min(ln, n - got)
            out[got : got + take] = frombuffer_exact(buf, np.uint8, take, offset=pos)
            pos += ln
        got += ln
    if got != n and exact:
        raise ValueError(f"byte RLE stream produced {got} values, expected {n}")
    return out
