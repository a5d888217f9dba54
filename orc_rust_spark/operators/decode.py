"""The decode operator: chunk table -> original rows.

Groups chunk-table rows by (part_id, chunk_ord) with applyInPandas and
re-assembles every column from its streams — the read-side mirror of
operators.encode, playing the role of the reference's NaiveStripeDecoder
(src/array_decoder/mod.rs:290-364): per column pull PRESENT then
DATA/LENGTH/SECONDARY/DICTIONARY_DATA through the block decompressor and
the RLE/FSST decoders, then re-space nulls.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..codecs import block as blockc
from ..codecs.boolean_rle import decode_boolean_rle
from ..codecs.float_plain import decode_float
from ..codecs.fsst import FsstTable, fsst_decode
from ..codecs.rle_v2 import decode_rlev2
from ..codecs.timestamp_split import combine_timestamp_ns
from ..sources import chunk_table as ct


def _kind_of(dt: T.DataType) -> str:
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return "int64"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.DoubleType):
        return "float64"
    if isinstance(dt, T.FloatType):
        return "float32"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BinaryType):
        return "binary"
    raise TypeError(f"unsupported type {dt}")


def _split_binary(flat: bytes, lengths: np.ndarray) -> pa.LargeBinaryArray:
    offsets = np.zeros(lengths.size + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), lengths.size,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(flat)],
    )


def decode_chunk_pdf(pdf: pd.DataFrame, col_kinds: dict[str, str]) -> pd.DataFrame:
    """Decode one chunk's stream rows back into original-schema rows."""
    out: dict[str, object] = {}
    n = int(pdf["row_count"].iloc[0])
    for name, kind in col_kinds.items():
        rows = pdf[pdf["column"] == name]
        streams: dict[str, bytes] = {}
        meta = {}
        for _, r in rows.iterrows():
            streams[r["stream_kind"]] = blockc.decompress_stream(
                bytes(r["data"]), r["block_codec"]
            )
            meta[r["stream_kind"]] = r
        data_meta = meta.get(ct.DATA)
        codec = data_meta["codec"]
        null_count = int(data_meta["null_count"])
        n_dense = n - null_count
        not_null = (
            decode_boolean_rle(streams[ct.PRESENT], n)
            if ct.PRESENT in streams
            else np.ones(n, dtype=bool)
        )

        if codec == "rle_v2":
            dense = decode_rlev2(streams[ct.DATA], n_dense, signed=True)
            if null_count:
                vals = np.zeros(n, dtype=np.int64)
                vals[not_null] = dense
                out[name] = pd.array(vals, dtype="Int64")
                out[name][~not_null] = pd.NA
            else:
                out[name] = dense
        elif codec == "timestamp_split":
            secs = decode_rlev2(streams[ct.DATA], n_dense, signed=True)
            nanos = decode_rlev2(streams[ct.SECONDARY], n_dense, signed=False)
            us = combine_timestamp_ns(secs, nanos) // 1000
            ser = pd.Series(pd.to_datetime(us, unit="us"))
            if null_count:
                full = pd.Series(pd.NaT, index=range(n), dtype="datetime64[ns]")
                full[not_null] = ser.values
                out[name] = full
            else:
                out[name] = ser
        elif codec == "float_plain":
            dtype = np.float32 if kind == "float32" else np.float64
            dense = decode_float(streams[ct.DATA], n_dense, dtype)
            if null_count:
                vals = np.full(n, np.nan, dtype=dtype)
                vals[not_null] = dense
                out[name] = vals
            else:
                out[name] = dense
        elif codec == "boolean_rle" and kind == "bool":
            dense = decode_boolean_rle(streams[ct.DATA], n_dense)
            vals = np.zeros(n, dtype=object)
            vals[not_null] = dense
            if null_count:
                vals[~not_null] = None
            out[name] = vals
        elif codec in ("direct", "dict", "fsst"):
            if codec == "direct":
                lengths = decode_rlev2(streams[ct.LENGTH], n_dense, signed=False)
                arr = _split_binary(streams[ct.DATA], lengths)
            elif codec == "dict":
                dict_size = int(data_meta["dict_size"])
                indices = decode_rlev2(streams[ct.DATA], n_dense, signed=False)
                dict_lens = decode_rlev2(streams[ct.LENGTH], dict_size, signed=False)
                dictionary = _split_binary(streams[ct.DICTIONARY_DATA], dict_lens)
                arr = pa.DictionaryArray.from_arrays(
                    pa.array(indices, type=pa.int64()), dictionary
                ).cast(pa.large_binary())
            else:  # fsst
                table = FsstTable.deserialize(streams[ct.SYMBOL_TABLE])
                span = np.array([0, len(streams[ct.DATA])], dtype=np.int64)
                flat, _ = fsst_decode(streams[ct.DATA], span, table)
                lengths = decode_rlev2(streams[ct.LENGTH], n_dense, signed=False)
                arr = _split_binary(flat, lengths)
            if kind == "string":
                dense_py = arr.cast(pa.large_string()).to_pylist()
            else:
                dense_py = arr.to_pylist()
            vals = np.empty(n, dtype=object)
            vals[not_null] = dense_py
            if null_count:
                vals[~not_null] = None
            out[name] = vals
        else:
            raise ValueError(f"unknown codec {codec!r} for column {name!r}")
    return pd.DataFrame(out, columns=list(col_kinds.keys()))


def decode_table(chunks: DataFrame, schema: T.StructType) -> DataFrame:
    """Chunk-table DataFrame -> DataFrame with the original schema."""
    col_kinds = {f.name: _kind_of(f.dataType) for f in schema.fields}

    def decode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        return decode_chunk_pdf(pdf, col_kinds)

    return chunks.groupBy("part_id", "chunk_ord").applyInPandas(decode_group, schema=schema)
