"""String/binary stream codecs: DIRECT and DICTIONARY.

DIRECT   : DATA = concatenated value bytes, LENGTH = unsigned RLEv2 of
           per-value byte lengths.
           (reference parity: write src/writer/column.rs:260-391,
            read src/array_decoder/string.rs:87-188)
DICTIONARY: DICTIONARY_DATA = concatenated *sorted* unique values,
           LENGTH = unsigned RLEv2 of dictionary entry lengths,
           DATA = unsigned RLEv2 of indexes into the sorted dictionary.
           The reference only *decodes* dictionaries
           (src/array_decoder/string.rs:65-84,190-229; its writer is always
           DirectV2 per src/writer/stripe.rs:181-184) — the encode side here
           follows the public ORC v1 spec (sorted symbol table).

Values move as pyarrow LargeBinary arrays so concatenation/splitting is
zero-copy C++, never a per-row Python loop. Nulls are handled by the caller
(PRESENT stream); inputs here are dense non-null values.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .rle_v2 import decode_rlev2, encode_rlev2


def _as_large_binary(values) -> pa.LargeBinaryArray:
    if isinstance(values, pa.Array):
        arr = values
    else:
        arr = pa.array(values)
    t = arr.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        arr = arr.cast(pa.large_binary())
    elif pa.types.is_binary(t):
        arr = arr.cast(pa.large_binary())
    elif not pa.types.is_large_binary(t):
        raise TypeError(f"expected string/binary array, got {t}")
    if arr.null_count:
        raise ValueError("string codec inputs must be dense (strip nulls first)")
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


def _flatten(arr: pa.LargeBinaryArray) -> tuple[bytes, np.ndarray]:
    """-> (concatenated data bytes, per-value lengths int64). Slices the
    value buffer through a memoryview so a sliced array's payload is
    copied once, not twice."""
    buffers = arr.buffers()  # [validity, offsets, data]
    offsets = np.frombuffer(buffers[1], dtype=np.int64, count=len(arr) + 1, offset=arr.offset * 8)
    data = (bytes(memoryview(buffers[2])[offsets[0]: offsets[-1]])
            if len(arr) else b"")
    return data, np.diff(offsets)


def sorted_dictionary(
    dense: pa.Array, denc: pa.Array | None = None
) -> tuple[np.ndarray, bytes, np.ndarray, int]:
    """-> (per-value ranks into the SORTED dictionary, dict bytes,
    per-symbol lengths, dict size) for a dense (null-free) binary array.

    ORC dictionaries are sorted (src/array_decoder/string.rs:213-215);
    all work stays in Arrow kernels — no per-distinct Python objects.
    Shared by the chunk-table encoder and the ORC stripe writer so the
    sorted-dictionary contract cannot drift between them. ``denc`` lets
    the caller pass the selector's already-computed dictionary_encode of
    the SAME array — it was the single most expensive encode kernel and
    was otherwise paid twice per dict column (code-review r6)."""
    if denc is None:
        denc = dense.dictionary_encode()
    indices = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    order = pa.compute.sort_indices(denc.dictionary).to_numpy().astype(np.int64)
    rank = np.empty_like(order)
    rank[order] = np.arange(order.size)
    sorted_dict = denc.dictionary.take(pa.array(order))
    if not pa.types.is_large_binary(sorted_dict.type):
        sorted_dict = sorted_dict.cast(pa.large_binary())
    dict_data, dict_lens = _flatten(sorted_dict)
    return rank[indices], dict_data, dict_lens, len(sorted_dict)


def _assemble(data: bytes, lengths: np.ndarray) -> pa.LargeBinaryArray:
    offsets = np.zeros(lengths.size + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), lengths.size, [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data)]
    )


# --- DIRECT -----------------------------------------------------------------


def encode_string_direct(values) -> tuple[bytes, bytes]:
    """-> (DATA bytes, LENGTH stream)."""
    arr = _as_large_binary(values)
    data, lengths = _flatten(arr)
    return data, encode_rlev2(lengths, signed=False)


def decode_string_direct(data: bytes, length_stream: bytes, n: int) -> pa.LargeBinaryArray:
    lengths = decode_rlev2(length_stream, n, signed=False)
    return _assemble(data, lengths)


# --- DICTIONARY ---------------------------------------------------------------


def encode_string_dict(values) -> tuple[bytes, bytes, bytes, int]:
    """-> (DATA index stream, DICTIONARY_DATA bytes, LENGTH stream, dict_size).

    Dictionary entries are sorted (ORC spec); indexes are remapped through
    the rank permutation — via the shared sorted_dictionary kernel (the
    old Python-object argsort duplicate is gone; code-review r6)."""
    arr = _as_large_binary(values)
    ranks, dict_data, dict_lengths, n_dict = sorted_dictionary(arr)
    return (
        encode_rlev2(ranks, signed=False),
        dict_data,
        encode_rlev2(dict_lengths, signed=False),
        n_dict,
    )


def decode_string_dict(
    index_stream: bytes, dict_data: bytes, length_stream: bytes, n: int, dict_size: int
) -> pa.LargeBinaryArray:
    indices = decode_rlev2(index_stream, n, signed=False)
    lengths = decode_rlev2(length_stream, dict_size, signed=False)
    dictionary = _assemble(dict_data, lengths)
    dict_arr = pa.DictionaryArray.from_arrays(pa.array(indices, type=pa.int64()), dictionary)
    return dict_arr.cast(pa.large_binary())
