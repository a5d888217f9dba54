"""Plain IEEE-754 little-endian float encoding (no RLE).

(reference parity: src/encoding/float.rs:39-111)
"""

from __future__ import annotations

import numpy as np

from .util import frombuffer_exact


def encode_float(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values)
    if v.dtype not in (np.dtype("<f4"), np.dtype("<f8")):
        raise TypeError(f"expected float32/float64, got {v.dtype}")
    return v.tobytes()


def decode_float(buf, n: int, dtype=np.float64) -> np.ndarray:
    return frombuffer_exact(buf, np.dtype(dtype).newbyteorder("<"), n)
