"""The decode operator: chunk table -> original rows.

Re-assembles every column from its streams — the read-side mirror of
operators.encode, playing the role of the reference's NaiveStripeDecoder
(src/array_decoder/mod.rs:290-364): per column pull PRESENT then
DATA/LENGTH/SECONDARY/DICTIONARY_DATA through the block decompressor and
the RLE/FSST decoders, then re-space nulls.

Two execution strategies over the same Arrow-array core:
- decode_table        groupBy(part_id, chunk_ord).applyInPandas — robust,
                      works on any row layout
- decode_table_arrow  repartition+sortWithinPartitions then mapInArrow —
                      decoded values stay Arrow end to end (no Python
                      string objects), the fast path
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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
    if isinstance(dt, T.DecimalType):
        return f"decimal:{dt.precision}:{dt.scale}"
    raise TypeError(f"unsupported type {dt}")


def _arrow_type(dt: T.DataType, kind: str) -> pa.DataType:
    if kind.startswith("decimal:"):
        _, p, s = kind.split(":")
        return pa.decimal128(int(p), int(s))
    if kind == "int64":  # width must match the Spark type exactly
        return {
            T.LongType: pa.int64(),
            T.IntegerType: pa.int32(),
            T.ShortType: pa.int16(),
            T.ByteType: pa.int8(),
        }[type(dt)]
    return {
        "timestamp": pa.timestamp("us")
        if isinstance(dt, T.TimestampNTZType)
        else pa.timestamp("us", tz="UTC"),
        "float64": pa.float64(),
        "float32": pa.float32(),
        "bool": pa.bool_(),
        "string": pa.string(),
        "binary": pa.binary(),
    }[kind]


def _split_binary(flat: bytes, lengths: np.ndarray) -> pa.LargeBinaryArray:
    offsets = np.zeros(lengths.size + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), lengths.size,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(flat)],
    )


def _respace(dense: pa.Array, not_null: np.ndarray) -> pa.Array:
    """Scatter a dense array into null slots via a null-propagating take."""
    n = not_null.shape[0]
    idx = np.zeros(n, dtype=np.int64)
    idx[not_null] = np.arange(int(not_null.sum()))
    mask = ~not_null
    return dense.take(pa.array(idx, type=pa.int64(), mask=mask))


def decode_chunk_arrays(
    stream_rows: list[dict], col_kinds: dict[str, str]
) -> dict[str, pa.Array]:
    """Decode one chunk's stream rows -> {column: pa.Array} (dense schema).

    ``stream_rows``: dicts with column/stream_kind/codec/block_codec/data/
    row_count/null_count/dict_size.
    """
    n = int(stream_rows[0]["row_count"])
    by_col: dict[str, dict[str, dict]] = {}
    for r in stream_rows:
        by_col.setdefault(r["column"], {})[r["stream_kind"]] = r
    out: dict[str, pa.Array] = {}
    for name, kind in col_kinds.items():
        metas = by_col[name]
        streams = {
            k: blockc.decompress_stream(bytes(r["data"]), r["block_codec"])
            for k, r in metas.items()
        }
        data_meta = metas[ct.DATA]
        codec = data_meta["codec"]
        null_count = int(data_meta["null_count"])
        n_dense = n - null_count
        not_null = (
            decode_boolean_rle(streams[ct.PRESENT], n)
            if ct.PRESENT in streams
            else None
        )

        if codec == "rle_v2":
            vals = decode_rlev2(streams[ct.DATA], n_dense, signed=True)
            dense = pa.array(vals, type=pa.int64())
        elif codec == "timestamp_split":
            secs = decode_rlev2(streams[ct.DATA], n_dense, signed=True)
            nanos = decode_rlev2(streams[ct.SECONDARY], n_dense, signed=False)
            us = combine_timestamp_ns(secs, nanos) // 1000
            dense = pa.array(us, type=pa.int64()).cast(pa.timestamp("us"))
        elif codec == "decimal":
            from ..codecs.decimal_codec import decode_decimal

            _, p, s = kind.split(":")
            mantissa = decode_decimal(
                streams[ct.DATA], streams[ct.SECONDARY], n_dense, int(s)
            )
            words = np.empty((n_dense, 2), dtype=np.uint64)
            words[:, 0] = mantissa.view(np.uint64)
            words[:, 1] = (mantissa >> np.int64(63)).view(np.uint64)  # sign ext
            dense = pa.Array.from_buffers(
                pa.decimal128(int(p), int(s)), n_dense,
                [None, pa.py_buffer(words.tobytes())],
            )
        elif codec == "float_plain":
            dtype = np.float32 if kind == "float32" else np.float64
            dense = pa.array(decode_float(streams[ct.DATA], n_dense, dtype))
        elif codec == "boolean_rle":
            dense = pa.array(decode_boolean_rle(streams[ct.DATA], n_dense))
        elif codec in ("direct", "dict", "fsst"):
            if codec == "direct":
                lengths = decode_rlev2(streams[ct.LENGTH], n_dense, signed=False)
                dense = _split_binary(streams[ct.DATA], lengths)
            elif codec == "dict":
                dict_size = int(data_meta["dict_size"])
                indices = decode_rlev2(streams[ct.DATA], n_dense, signed=False)
                dict_lens = decode_rlev2(streams[ct.LENGTH], dict_size, signed=False)
                dictionary = _split_binary(streams[ct.DICTIONARY_DATA], dict_lens)
                dense = pa.DictionaryArray.from_arrays(
                    pa.array(indices, type=pa.int64()), dictionary
                ).cast(pa.large_binary())
            else:
                table = FsstTable.deserialize(streams[ct.SYMBOL_TABLE])
                span = np.array([0, len(streams[ct.DATA])], dtype=np.int64)
                flat, _ = fsst_decode(streams[ct.DATA], span, table)
                lengths = decode_rlev2(streams[ct.LENGTH], n_dense, signed=False)
                dense = _split_binary(flat, lengths)
            if kind == "string":
                dense = dense.cast(pa.large_string())
        else:
            raise ValueError(f"unknown codec {codec!r} for column {name!r}")

        out[name] = _respace(dense, not_null) if not_null is not None else dense
    return out


def _rows_to_stream_dicts(pdf: pd.DataFrame) -> list[dict]:
    return pdf[
        ["column", "stream_kind", "codec", "block_codec", "data",
         "row_count", "null_count", "dict_size"]
    ].to_dict("records")


def decode_chunk_pdf(pdf: pd.DataFrame, col_kinds: dict[str, str]) -> pd.DataFrame:
    arrays = decode_chunk_arrays(_rows_to_stream_dicts(pdf), col_kinds)
    cols = {}
    for name, arr in arrays.items():
        kind = col_kinds[name]
        if kind == "timestamp":
            cols[name] = arr.cast(pa.timestamp("us")).to_pandas()
        elif kind in ("string", "binary", "bool"):
            cols[name] = arr.to_pandas()  # object dtype, None for nulls
        else:
            s = arr.to_pandas()
            if kind == "int64" and arr.null_count:
                s = pd.array(s, dtype="Int64")
            cols[name] = s
    return pd.DataFrame(cols, columns=list(col_kinds.keys()))


def decode_table(chunks: DataFrame, schema: T.StructType) -> DataFrame:
    """Chunk-table DataFrame -> DataFrame with the original schema
    (grouped applyInPandas strategy)."""
    col_kinds = {f.name: _kind_of(f.dataType) for f in schema.fields}

    def decode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        return decode_chunk_pdf(pdf, col_kinds)

    return chunks.groupBy("part_id", "chunk_ord").applyInPandas(decode_group, schema=schema)


def decode_table_arrow(chunks: DataFrame, schema: T.StructType) -> DataFrame:
    """Fast path: co-locate each chunk's stream rows, decode to Arrow
    RecordBatches directly — decoded strings never become Python objects."""
    col_kinds = {f.name: _kind_of(f.dataType) for f in schema.fields}
    arrow_schema = pa.schema(
        [pa.field(f.name, _arrow_type(f.dataType, col_kinds[f.name])) for f in schema.fields]
    )
    names = [f.name for f in schema.fields]

    def decode_iter(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        pending: list[dict] = []
        key = None

        def flush():
            arrays = decode_chunk_arrays(pending, col_kinds)
            cols = []
            for name in names:
                arr = arrays[name]
                target = arrow_schema.field(name).type
                if not arr.type.equals(target):
                    arr = arr.cast(target)
                cols.append(arr)
            return pa.RecordBatch.from_arrays(cols, schema=arrow_schema)

        for b in batches:
            tbl = b.to_pylist()
            for row in tbl:
                k = (row["part_id"], row["chunk_ord"])
                if key is not None and k != key and pending:
                    yield flush()
                    pending = []
                key = k
                pending.append(row)
        if pending:
            yield flush()

    co_located = chunks.repartition(
        F.col("part_id"), F.col("chunk_ord")
    ).sortWithinPartitions("part_id", "chunk_ord")
    return co_located.mapInArrow(decode_iter, schema=schema)
