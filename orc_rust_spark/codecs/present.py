"""PRESENT stream handling: null mask <-> boolean RLE + dense value spacing.

The writer strips nulls before encoding data streams; the reader re-spaces
dense decoded values into the null slots. encode_present/decode_present are
the production PRESENT entry points (operators.encode/.decode, orc_file);
strip_nulls/decode_spaced are the NumPy-space reference of the respace
semantics the Arrow paths implement with a null-propagating take.
(reference parity: src/encoding/mod.rs:64-91 decode_spaced,
src/writer/column.rs:103-139 null stripping)
"""

from __future__ import annotations

import numpy as np

from .boolean_rle import decode_boolean_rle, encode_boolean_rle


def encode_present(not_null: np.ndarray) -> bytes:
    """Boolean-RLE bytes of the not-null mask (True = value present)."""
    return encode_boolean_rle(not_null)


def decode_present(buf, n: int) -> np.ndarray:
    return decode_boolean_rle(buf, n)


def strip_nulls(values: np.ndarray, not_null: np.ndarray) -> np.ndarray:
    return values[not_null]


def decode_spaced(dense: np.ndarray, not_null: np.ndarray, fill=0) -> np.ndarray:
    """Scatter dense (non-null only) values back into an n-slot array."""
    out = np.full(not_null.shape[0], fill, dtype=dense.dtype)
    out[not_null] = dense
    return out
