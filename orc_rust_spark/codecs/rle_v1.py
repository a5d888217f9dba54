"""ORC RLEv1 integer encoding (decode-compat; public ORC v1 spec).

Format: control byte h
- 0x00..0x7F : run — length (h + 3, i.e. 3..130), one signed delta byte
               (-128..127), then the base value as (zigzag-)varint;
               values are base, base+delta, base+2*delta, ...
- 0x80..0xFF : literals — (256 - h) values (1..128), each a (zigzag-)varint.

The reference ships both directions (src/encoding/integer/rle_v1.rs:40-399)
but its writer always emits RLEv2 (src/writer/stripe.rs:178-180); ours does
too — this codec exists for read-compatibility and the inventory's sake.
"""

from __future__ import annotations

import numpy as np

from .util import (
    read_varint,
    write_varint,
    zigzag_decode_scalar,
    zigzag_encode,
    zigzag_encode_scalar,
)

MIN_RUN = 3
MAX_RUN = 130
MAX_LITERALS = 128


def encode_rlev1(values: np.ndarray, signed: bool = True) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.int64)
    out = bytearray()
    n = v.size
    if n == 0:
        return b""

    def emit_literals(chunk: np.ndarray) -> None:
        u = zigzag_encode(chunk) if signed else chunk.view(np.uint64)
        for s in range(0, chunk.size, MAX_LITERALS):
            take = min(MAX_LITERALS, chunk.size - s)
            out.append(256 - take)
            for x in u[s : s + take].tolist():
                out.extend(write_varint(int(x)))

    # detect runs of constant delta in {-128..127} with length >= 3
    i = 0
    lit_start = 0
    while i < n:
        run_len = 1
        if i + 1 < n:
            d = int(v[i + 1]) - int(v[i])
            if -128 <= d <= 127:
                j = i + 1
                while j + 1 < n and int(v[j + 1]) - int(v[j]) == d and (j - i + 1) < MAX_RUN:
                    j += 1
                run_len = j - i + 1
        if run_len >= MIN_RUN:
            if lit_start < i:
                emit_literals(v[lit_start:i])
            out.append(run_len - MIN_RUN)
            out.append(d & 0xFF)
            base = zigzag_encode_scalar(int(v[i])) if signed else int(v[i]) & ((1 << 64) - 1)
            out.extend(write_varint(base))
            i += run_len
            lit_start = i
        else:
            i += 1
    if lit_start < n:
        emit_literals(v[lit_start:n])
    return bytes(out)


def decode_rlev1(buf, n: int, signed: bool = True, exact: bool = True) -> np.ndarray:
    """``exact=False`` tolerates a stream continuing past ``n`` values
    (row-group seek decode starts mid-stream) and truncates the last run."""
    out = np.empty(n, dtype=np.int64)
    got = 0
    pos = 0
    while got < n:
        h = buf[pos]
        pos += 1
        if h < 0x80:
            length = h + MIN_RUN
            delta = buf[pos]
            pos += 1
            if delta >= 128:
                delta -= 256
            base_u, pos = read_varint(buf, pos)
            base = zigzag_decode_scalar(base_u) if signed else base_u
            if base >= 1 << 63:
                base -= 1 << 64
            take = min(length, n - got)
            out[got : got + take] = base + delta * np.arange(take, dtype=np.int64)
            got += length
        else:
            count = 256 - h
            take = min(count, n - got)
            vals = []
            for _ in range(take):
                u, pos = read_varint(buf, pos)
                x = zigzag_decode_scalar(u) if signed else u
                if x >= 1 << 63:
                    x -= 1 << 64
                vals.append(x)
            out[got : got + take] = vals
            got += count
    if got != n and exact:
        raise ValueError(f"RLEv1 stream produced {got} values, expected {n}")
    return out
