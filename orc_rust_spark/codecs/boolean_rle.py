"""ORC Boolean RLE: booleans -> MSB-first bit-packed bytes -> Byte RLE.

(reference parity: src/encoding/boolean.rs:33-170 — note the reference
flips Arrow's LSB bit order to ORC's MSB order; np.packbits is MSB-first
already.)

The tail byte is zero-padded; the decoder must therefore be told ``n``.
PRESENT streams are exactly this codec over the not-null mask.
"""

from __future__ import annotations

import numpy as np

from .byte_rle import decode_byte_rle, encode_byte_rle


def encode_boolean_rle(values: np.ndarray) -> bytes:
    b = np.ascontiguousarray(values, dtype=bool)
    return encode_byte_rle(np.packbits(b))


def decode_boolean_rle(buf, n: int, exact: bool = True) -> np.ndarray:
    n_bytes = (n + 7) // 8
    packed = decode_byte_rle(buf, n_bytes, exact=exact)
    return np.unpackbits(packed)[:n].astype(bool)
