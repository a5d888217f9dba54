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
    """Encode a uint8 array."""
    v = np.ascontiguousarray(values, dtype=np.uint8)
    out = bytearray()
    pending_start = 0  # start of pending literal span
    pending_len = 0

    def flush_literals(end_exclusive: int) -> None:
        nonlocal pending_start, pending_len
        s = pending_start
        while pending_len > 0:
            take = min(pending_len, MAX_LITERALS)
            out.append(256 - take)
            out.extend(v[s : s + take].tobytes())
            s += take
            pending_len -= take
        pending_start = end_exclusive

    starts, lengths = _run_lengths(v)
    for s, ln in zip(starts.tolist(), lengths.tolist()):
        if ln >= MIN_REPEAT:
            flush_literals(s)
            byte = int(v[s])
            remaining = ln
            while remaining >= MIN_REPEAT:
                take = min(remaining, MAX_RUN)
                out.append(take - MIN_REPEAT)
                out.append(byte)
                remaining -= take
            if remaining:  # 1-2 leftover after 130-chunking -> literals
                pending_start = s + ln - remaining
                pending_len = remaining
                flush_literals(s + ln)
            pending_start = s + ln
        else:
            if pending_len == 0:
                pending_start = s
            pending_len += ln
    flush_literals(v.size)
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
            out[got : got + take] = np.frombuffer(buf, dtype=np.uint8, count=take, offset=pos)
            pos += ln
        got += ln
    if got != n and exact:
        raise ValueError(f"byte RLE stream produced {got} values, expected {n}")
    return out
