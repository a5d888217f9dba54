"""Read real Apache ORC v1 files through THIS engine's codecs.

The interop proof the reference gets from its integration suite
(tests/integration/main.rs decodes official example files): here, files
written by an independent writer (pyarrow.orc) are parsed down to the raw
stream bytes — PostScript/Footer/StripeFooter protobufs, block-compression
framing — and every stream is decoded by orc_rust_spark's own RLEv2 /
RLEv1 / byte-RLE / boolean-RLE / float / string / decimal / timestamp
kernels, never by an ORC library.

Layout parity map (reference orc-rust):
- tail parse (PostScript <- last byte length, Footer): src/reader/metadata.rs:180-247
- stripe footer + (column,kind)->bytes stream map:    src/stripe.rs:128-182,312-336
- proto messages:                                      src/proto.rs (prost-generated)
- per-type decoder selection:                          src/array_decoder/mod.rs:390-511

The protobuf subset parser below implements just the wire format needed
for ORC's messages (varint + length-delimited + packed uint32) from the
public protobuf/ORC specs.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from ..codecs import block as blockc
from ..codecs.boolean_rle import decode_boolean_rle
from ..codecs.byte_rle import decode_byte_rle
from ..codecs.decimal_codec import decode_decimal
from ..codecs.float_plain import decode_float
from ..codecs.rle_v1 import decode_rlev1
from ..codecs.rle_v2 import decode_rlev2
from ..codecs.timestamp_split import combine_timestamp_ns

MAGIC = b"ORC"

# proto::CompressionKind
COMPRESSION = {0: "none", 1: "zlib", 2: "snappy", 3: "lzo", 4: "lz4", 5: "zstd"}
# proto::Type::Kind
K_BOOLEAN, K_BYTE, K_SHORT, K_INT, K_LONG = 0, 1, 2, 3, 4
K_FLOAT, K_DOUBLE, K_STRING, K_BINARY, K_TIMESTAMP = 5, 6, 7, 8, 9
K_LIST, K_MAP, K_STRUCT, K_UNION, K_DECIMAL = 10, 11, 12, 13, 14
K_DATE, K_VARCHAR, K_CHAR, K_TIMESTAMP_INSTANT = 15, 16, 17, 18
# proto::Stream::Kind
S_PRESENT, S_DATA, S_LENGTH, S_DICTIONARY_DATA, S_DICTIONARY_COUNT = 0, 1, 2, 3, 4
S_SECONDARY, S_ROW_INDEX, S_BLOOM_FILTER, S_BLOOM_FILTER_UTF8 = 5, 6, 7, 8
# proto::ColumnEncoding::Kind
E_DIRECT, E_DICTIONARY, E_DIRECT_V2, E_DICTIONARY_V2 = 0, 1, 2, 3


# --- minimal protobuf wire reader -------------------------------------------


def _varint(buf, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _fields(buf) -> list[tuple[int, int, object]]:
    """[(field_no, wire_type, value)] — value is int for varint, bytes for
    length-delimited; fixed32/64 returned as raw ints (unused by ORC tail)."""
    pos, n = 0, len(buf)
    out = []
    while pos < n:
        tag, pos = _varint(buf, pos)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            v, pos = _varint(buf, pos)
        elif wt == 2:
            ln, pos = _varint(buf, pos)
            v = bytes(buf[pos: pos + ln])
            pos += ln
        elif wt == 5:
            v = int.from_bytes(buf[pos: pos + 4], "little")
            pos += 4
        elif wt == 1:
            v = int.from_bytes(buf[pos: pos + 8], "little")
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")
        out.append((fno, wt, v))
    return out


def _packed_u32(v) -> list[int]:
    if isinstance(v, int):  # unpacked single value
        return [v]
    out, pos = [], 0
    while pos < len(v):
        x, pos = _varint(v, pos)
        out.append(x)
    return out


# --- metadata ----------------------------------------------------------------


@dataclass
class OrcType:
    kind: int
    subtypes: list[int] = field(default_factory=list)
    field_names: list[str] = field(default_factory=list)
    precision: int = 0
    scale: int = 0


@dataclass
class StripeInfo:
    offset: int
    index_length: int
    data_length: int
    footer_length: int
    number_of_rows: int


@dataclass
class OrcMeta:
    compression: str
    types: list[OrcType]
    stripes: list[StripeInfo]
    number_of_rows: int
    # per stripe: {column_id: (min, max)} from the Metadata section's
    # StripeStatistics (int stats are zigzag sint64; string stats raw)
    stripe_stats: list[dict] = field(default_factory=list)


def _parse_column_stats(raw: bytes):
    """ColumnStatistics -> (min, max) for int/double/string stats, else None."""
    for fno, _, v in _fields(raw):
        if fno == 2:  # intStatistics (sint64 = zigzag varints)
            d = {}
            for f2, _, v2 in _fields(v):
                d[f2] = (v2 >> 1) ^ -(v2 & 1)
            if 1 in d and 2 in d:
                return (d[1], d[2])
        elif fno == 3:  # doubleStatistics (fixed64 IEEE-754 bits)
            import struct as _struct

            d = {}
            for f2, w2, v2 in _fields(v):
                if w2 == 1:
                    d[f2] = _struct.unpack("<d", int(v2).to_bytes(8, "little"))[0]
            if 1 in d and 2 in d:
                return (d[1], d[2])
        elif fno == 4:  # stringStatistics
            d = {}
            for f2, _, v2 in _fields(v):
                if f2 in (1, 2):
                    d[f2] = v2.decode()
            if 1 in d and 2 in d:
                return (d[1], d[2])
    return None


def _decompress_tail(buf: bytes, compression: str) -> bytes:
    # footer/metadata/stripe-footers use the same block framing as streams
    return bytes(blockc.decompress_stream(buf, compression))


def read_metadata(path: str) -> OrcMeta:
    size = os.path.getsize(path)
    with open(path, "rb") as fh:
        tail_len = min(size, 16 * 1024)
        fh.seek(size - tail_len)
        tail = fh.read(tail_len)
        ps_len = tail[-1]
        ps = _fields(tail[-1 - ps_len: -1])
        footer_len = compression = meta_len = 0
        for fno, _, v in ps:
            if fno == 1:
                footer_len = v
            elif fno == 2:
                compression = v
            elif fno == 5:
                meta_len = v
        comp = COMPRESSION[compression]
        if comp not in blockc.available_codecs():
            raise NotImplementedError(f"compression {comp} not available in container")
        footer_end = size - 1 - ps_len
        if footer_len + meta_len > tail_len - 1 - ps_len:
            fh.seek(footer_end - footer_len - meta_len)
            both = fh.read(footer_len + meta_len)
            meta_raw, footer_raw = both[:meta_len], both[meta_len:]
        else:
            start = tail_len - 1 - ps_len - footer_len
            footer_raw = tail[start: start + footer_len]
            meta_raw = tail[start - meta_len: start]
    footer = _fields(_decompress_tail(footer_raw, comp))
    types: list[OrcType] = []
    stripes: list[StripeInfo] = []
    n_rows = 0
    for fno, _, v in footer:
        if fno == 3:  # StripeInformation
            d = {1: 0, 2: 0, 3: 0, 4: 0, 5: 0}
            for f2, _, v2 in _fields(v):
                d[f2] = v2
            stripes.append(StripeInfo(d[1], d[2], d[3], d[4], d[5]))
        elif fno == 4:  # Type
            t = OrcType(kind=0)
            for f2, _, v2 in _fields(v):
                if f2 == 1:
                    t.kind = v2
                elif f2 == 2:
                    t.subtypes.extend(_packed_u32(v2))
                elif f2 == 3:
                    t.field_names.append(v2.decode())
                elif f2 == 5:
                    t.precision = v2
                elif f2 == 6:
                    t.scale = v2
            types.append(t)
        elif fno == 6:
            n_rows = v
    stripe_stats: list[dict] = []
    if meta_len:
        for fno, _, v in _fields(_decompress_tail(meta_raw, comp)):
            if fno == 1:  # StripeStatistics
                per_col: dict[int, tuple] = {}
                for ci, (f2, _, v2) in enumerate(
                    x for x in _fields(v) if x[0] == 1
                ):
                    mm = _parse_column_stats(v2)
                    if mm is not None:
                        per_col[ci] = mm
                stripe_stats.append(per_col)
    return OrcMeta(comp, types, stripes, n_rows, stripe_stats)


# --- stripe decode -----------------------------------------------------------


def _read_stripe_footer(raw: bytes, comp: str):
    streams = []  # (column, kind, length)
    encodings = []  # (kind, dict_size)
    tz = "UTC"
    for fno, _, v in _fields(_decompress_tail(raw, comp)):
        if fno == 1:
            d = {1: 0, 2: 0, 3: 0}
            for f2, _, v2 in _fields(v):
                d[f2] = v2
            streams.append((d[2], d[1], d[3]))
        elif fno == 2:
            k, ds = 0, 0
            for f2, _, v2 in _fields(v):
                if f2 == 1:
                    k = v2
                elif f2 == 2:
                    ds = v2
            encodings.append((k, ds))
        elif fno == 3:
            tz = v.decode()
    return streams, encodings, tz


def _int_decoder(enc_kind: int):
    """DIRECT (v1) files decode through RLEv1 — the one place E10 is load-
    bearing; DIRECT_V2 through RLEv2."""
    if enc_kind in (E_DIRECT, E_DICTIONARY):
        return decode_rlev1
    return decode_rlev2


def _split_binary(flat: bytes, lengths: np.ndarray) -> pa.Array:
    offsets = np.zeros(lengths.size + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), lengths.size,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(bytes(flat))],
    )


def _respace(dense: pa.Array, not_null: np.ndarray | None) -> pa.Array:
    if not_null is None:
        return dense
    idx = np.zeros(not_null.shape[0], dtype=np.int64)
    idx[not_null] = np.arange(int(not_null.sum()))
    return dense.take(pa.array(idx, type=pa.int64(), mask=~not_null))


def _decode_column(col_id: int, t: OrcType, streams: dict, encodings, n: int,
                   comp: str, name: str) -> pa.Array:
    def get(kind):
        raw = streams.get((col_id, kind))
        return None if raw is None else blockc.decompress_stream(raw, comp)

    enc_kind, dict_size = encodings[col_id]
    rle = _int_decoder(enc_kind)
    present = get(S_PRESENT)
    not_null = decode_boolean_rle(present, n) if present is not None else None
    n_dense = int(not_null.sum()) if not_null is not None else n
    data = get(S_DATA)
    k = t.kind

    if k in (K_SHORT, K_INT, K_LONG):
        vals = rle(data, n_dense, signed=True)
        dense = pa.array(vals, type=pa.int64())
        target = {K_SHORT: pa.int16(), K_INT: pa.int32(), K_LONG: pa.int64()}[k]
        out = _respace(dense, not_null)
        return out if target == pa.int64() else out.cast(target)
    if k == K_BYTE:
        u8 = decode_byte_rle(data, n_dense)
        return _respace(pa.array(u8.view(np.int8), type=pa.int8()), not_null)
    if k == K_BOOLEAN:
        bits = decode_boolean_rle(data, n_dense)
        return _respace(pa.array(bits), not_null)
    if k == K_FLOAT:
        return _respace(pa.array(decode_float(data, n_dense, np.float32)), not_null)
    if k == K_DOUBLE:
        return _respace(pa.array(decode_float(data, n_dense, np.float64)), not_null)
    if k == K_DATE:
        days = rle(data, n_dense, signed=True)
        dense = pa.array(days.astype(np.int32), type=pa.int32()).cast(pa.date32())
        return _respace(dense, not_null)
    if k in (K_TIMESTAMP, K_TIMESTAMP_INSTANT):
        secs = rle(data, n_dense, signed=True)
        nanos = rle(get(S_SECONDARY), n_dense, signed=False)
        ns = combine_timestamp_ns(secs, nanos)
        dense = pa.array(ns // 1000, type=pa.int64()).cast(pa.timestamp("us"))
        return _respace(dense, not_null)
    if k == K_DECIMAL:
        mant = decode_decimal(data, get(S_SECONDARY), n_dense, t.scale)
        words = np.empty((n_dense, 2), dtype=np.uint64)
        words[:, 0] = mant.view(np.uint64)
        words[:, 1] = (mant >> np.int64(63)).view(np.uint64)
        dense = pa.Array.from_buffers(
            pa.decimal128(t.precision or 38, t.scale), n_dense,
            [None, pa.py_buffer(words.tobytes())],
        )
        return _respace(dense, not_null)
    if k in (K_STRING, K_BINARY, K_VARCHAR, K_CHAR):
        if enc_kind in (E_DICTIONARY, E_DICTIONARY_V2):
            indices = rle(data, n_dense, signed=False)
            dict_lens = rle(get(S_LENGTH), dict_size, signed=False)
            dictionary = _split_binary(get(S_DICTIONARY_DATA), dict_lens)
            dense = pa.DictionaryArray.from_arrays(
                pa.array(indices, type=pa.int64()), dictionary
            ).cast(pa.large_binary())
        else:
            lengths = rle(get(S_LENGTH), n_dense, signed=False)
            dense = _split_binary(data, lengths)
        if k != K_BINARY:
            dense = dense.cast(pa.large_string())
        return _respace(dense, not_null)
    raise NotImplementedError(f"ORC type kind {k} for column {name!r}")


def decode_stripe(buf: bytes, footer_raw: bytes, meta: OrcMeta, n_rows: int) -> pa.Table:
    """One stripe's raw bytes (index+data regions) + its footer -> Table.

    The stripe footer lists ALL streams in file order — index-region
    streams (ROW_INDEX/BLOOM) first, then data streams — so offsets are
    walked across the whole region (src/stripe.rs:154-182 analog)."""
    stream_list, encodings, _tz = _read_stripe_footer(footer_raw, meta.compression)
    streams: dict[tuple[int, int], bytes] = {}
    pos = 0
    for col, kind, length in stream_list:
        streams[(col, kind)] = buf[pos: pos + length]
        pos += length
    root = meta.types[0]
    cols = {}
    for child_id, name in zip(root.subtypes, root.field_names):
        cols[name] = _decode_column(
            child_id, meta.types[child_id], streams, encodings, n_rows,
            meta.compression, name,
        )
    return pa.table(cols)


def orc_to_table(path: str) -> pa.Table:
    """Decode a whole ORC file with this engine's codecs -> pa.Table."""
    meta = read_metadata(path)
    parts = []
    with open(path, "rb") as fh:
        for st in meta.stripes:
            fh.seek(st.offset)
            body = fh.read(st.index_length + st.data_length)
            footer_raw = fh.read(st.footer_length)
            parts.append(decode_stripe(body, footer_raw, meta, st.number_of_rows))
    return pa.concat_tables(parts) if parts else pa.table({})


# --- write side: emit real ORC v1 files from this engine's streams -----------


def _pb_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _pb_field(fno: int, wt: int, payload) -> bytes:
    tag = _pb_varint((fno << 3) | wt)
    if wt == 0:
        return tag + _pb_varint(payload)
    return tag + _pb_varint(len(payload)) + bytes(payload)


_ARROW_TO_ORC_KIND = [
    (pa.types.is_boolean, K_BOOLEAN),
    (lambda t: pa.types.is_integer(t) and t.bit_width == 8, K_BYTE),
    (lambda t: pa.types.is_integer(t) and t.bit_width == 16, K_SHORT),
    (lambda t: pa.types.is_integer(t) and t.bit_width == 32, K_INT),
    (lambda t: pa.types.is_integer(t) and t.bit_width == 64, K_LONG),
    (lambda t: pa.types.is_float32(t), K_FLOAT),
    (lambda t: pa.types.is_float64(t), K_DOUBLE),
    (lambda t: pa.types.is_string(t) or pa.types.is_large_string(t), K_STRING),
    (lambda t: pa.types.is_binary(t) or pa.types.is_large_binary(t), K_BINARY),
    (pa.types.is_timestamp, K_TIMESTAMP),
    (pa.types.is_date32, K_DATE),
    (pa.types.is_decimal, K_DECIMAL),
]

# our chunk-table stream kinds -> proto::Stream::Kind
_KIND_TO_ORC = {
    "PRESENT": S_PRESENT, "DATA": S_DATA, "LENGTH": S_LENGTH,
    "DICTIONARY_DATA": S_DICTIONARY_DATA, "SECONDARY": S_SECONDARY,
}
# within a column, the file-order of stream kinds we emit
_STREAM_ORDER = ["PRESENT", "DATA", "LENGTH", "DICTIONARY_DATA", "SECONDARY"]


def _orc_kind_of(t: pa.DataType) -> int:
    for pred, kind in _ARROW_TO_ORC_KIND:
        if pred(t):
            return kind
    raise NotImplementedError(f"no ORC mapping for arrow type {t}")


def write_orc(table: pa.Table, path: str, compression: str = "zlib",
              stripe_rows: int = 100_000) -> None:
    """Write a flat-schema Arrow table as a REAL Apache ORC v1 file using
    this engine's encoders — the reference ArrowWriter analog
    (src/arrow_writer.rs:71-259, stripe flush src/writer/stripe.rs:109-165).
    The output is independently readable by pyarrow.orc (asserted in
    tests): magic, stripes with PRESENT/DATA/LENGTH/DICTIONARY_DATA/
    SECONDARY streams from our RLEv2/byte-RLE/boolean/float/decimal/
    timestamp codecs, protobuf StripeFooter/Footer/PostScript, optional
    zlib block compression on every stream and on the tail.
    """
    from ..operators.encode import encode_chunk

    comp_enum = {"none": 0, "zlib": 1, "snappy": 2, "lz4": 4, "zstd": 5}[compression]

    def maybe_compress(b: bytes) -> bytes:
        return b if compression == "none" else blockc.compress_stream(b, compression)

    # column ids: root struct = 0, children 1..n (flat schema)
    names = table.column_names
    kinds = [_orc_kind_of(table.schema.field(n).type) for n in names]

    out = bytearray(MAGIC)
    stripe_infos = []
    plan = {n: {"block_codec": "none"} for n in names}
    for start in range(0, max(table.num_rows, 1), stripe_rows):
        sl = table.slice(start, stripe_rows)
        if sl.num_rows == 0:
            break
        batch = encode_chunk(sl, 0, 0, plan)
        rows = batch.to_pylist()
        by_col: dict[str, dict[str, dict]] = {}
        for r in rows:
            by_col.setdefault(r["column"], {})[r["stream_kind"]] = r
        offset = len(out)
        stream_protos = []
        data_len = 0
        enc_protos = [_pb_field(1, 0, E_DIRECT)]  # root struct encoding
        for col_idx, name in enumerate(names, start=1):
            col = by_col[name]
            codec = col["DATA"]["codec"]
            for sk in _STREAM_ORDER:
                if sk not in col:
                    continue
                payload = maybe_compress(bytes(col[sk]["data"]))
                out.extend(payload)
                stream_protos.append(
                    _pb_field(1, 0, _KIND_TO_ORC[sk])
                    + _pb_field(2, 0, col_idx)
                    + _pb_field(3, 0, len(payload))
                )
                data_len += len(payload)
            if codec == "dict":
                enc = _pb_field(1, 0, E_DICTIONARY_V2) + _pb_field(
                    2, 0, int(col["DATA"]["dict_size"])
                )
            elif codec in ("boolean_rle", "byte_rle", "float_plain"):
                enc = _pb_field(1, 0, E_DIRECT)
            else:  # rle_v2-based codecs
                enc = _pb_field(1, 0, E_DIRECT_V2)
            enc_protos.append(enc)
        sf = b"".join(_pb_field(1, 2, s) for s in stream_protos)
        sf += b"".join(_pb_field(2, 2, e) for e in enc_protos)
        sf += _pb_field(3, 2, b"UTC")  # writerTimezone
        sf_bytes = maybe_compress(sf)
        out.extend(sf_bytes)
        stripe_infos.append(
            _pb_field(1, 0, offset)          # offset
            + _pb_field(2, 0, 0)             # indexLength
            + _pb_field(3, 0, data_len)      # dataLength
            + _pb_field(4, 0, len(sf_bytes))  # footerLength
            + _pb_field(5, 0, sl.num_rows)   # numberOfRows
        )

    # footer: types (pre-order: root struct + children), stripes, row count
    root_type = _pb_field(1, 0, K_STRUCT)
    for i, name in enumerate(names, start=1):
        root_type += _pb_field(2, 0, i)  # subtypes (unpacked varints)
    for name in names:
        root_type += _pb_field(3, 2, name.encode())
    type_protos = [root_type]
    for name, k in zip(names, kinds):
        tp = _pb_field(1, 0, k)
        t = table.schema.field(name).type
        if pa.types.is_decimal(t):
            tp += _pb_field(5, 0, t.precision) + _pb_field(6, 0, t.scale)
        type_protos.append(tp)
    content_len = len(out) - len(MAGIC)
    footer = _pb_field(1, 0, len(MAGIC))           # headerLength
    footer += _pb_field(2, 0, content_len)         # contentLength
    footer += b"".join(_pb_field(3, 2, s) for s in stripe_infos)
    footer += b"".join(_pb_field(4, 2, t) for t in type_protos)
    footer += _pb_field(6, 0, table.num_rows)
    footer += _pb_field(8, 0, 10_000)              # rowIndexStride
    footer_bytes = maybe_compress(footer)
    out.extend(footer_bytes)

    ps = _pb_field(1, 0, len(footer_bytes))        # footerLength
    ps += _pb_field(2, 0, comp_enum)               # compression
    if compression != "none":
        ps += _pb_field(3, 0, blockc.DEFAULT_BLOCK_SIZE)
    ps += _pb_field(4, 0, 0)                       # version major 0
    ps += _pb_field(4, 0, 12)                      # version minor 12
    ps += _pb_field(5, 0, 0)                       # metadataLength
    ps += _pb_field(6, 0, 1)                       # writerVersion
    ps += _pb_field(8000, 2, MAGIC)                # magic
    out.extend(ps)
    out.append(len(ps))
    with open(path, "wb") as fh:
        fh.write(bytes(out))


def prune_stripes(meta: OrcMeta, column: str, lo=None, hi=None) -> list[int]:
    """Stripe indexes whose Metadata stats may intersect [lo, hi] — the
    reference's stripe-level predicate pushdown over StripeStatistics
    (three-valued: stripes without stats are kept)."""
    root = meta.types[0]
    try:
        col_id = root.subtypes[root.field_names.index(column)]
    except ValueError:
        return list(range(len(meta.stripes)))
    keep = []
    for i in range(len(meta.stripes)):
        stats = meta.stripe_stats[i] if i < len(meta.stripe_stats) else {}
        mm = stats.get(col_id)
        if mm is None:
            keep.append(i)
            continue
        mn, mx = mm
        if lo is not None and mx < lo:
            continue
        if hi is not None and mn > hi:
            continue
        keep.append(i)
    return keep


def orc_scan(spark, path: str, schema, predicate=None) -> "pyspark.sql.DataFrame":  # noqa: F821
    """Distributed ORC scan: one task per stripe (the reference's byte-range
    split model, src/arrow_reader.rs:358-372) — each task seeks to its
    stripe, fetches only that byte range, and decodes with this engine's
    codecs inside the Python worker.

    ``predicate``: optional (column, lo, hi) — stripes whose Metadata
    statistics exclude the range are never scheduled (stripe-level
    pushdown); the residual filter still must be applied by the caller.
    """
    from pyspark.sql import functions as F  # noqa: F401

    meta = read_metadata(path)
    idx = (
        prune_stripes(meta, predicate[0], predicate[1], predicate[2])
        if predicate else range(len(meta.stripes))
    )
    stripes = [
        (path, s.offset, s.index_length, s.data_length, s.footer_length, s.number_of_rows)
        for s in (meta.stripes[i] for i in idx)
    ]
    if not stripes:
        return spark.createDataFrame([], schema)
    sdf = spark.createDataFrame(
        stripes,
        "path string, offset long, index_length long, data_length long, "
        "footer_length long, rows long",
    ).repartition(min(len(stripes), spark.sparkContext.defaultParallelism))

    def scan(batches):
        for b in batches:
            for row in b.to_pylist():
                m = read_metadata(row["path"])
                with open(row["path"], "rb") as fh:
                    fh.seek(row["offset"])
                    body = fh.read(row["index_length"] + row["data_length"])
                    footer_raw = fh.read(row["footer_length"])
                tbl = decode_stripe(body, footer_raw, m, row["rows"])
                for rb in tbl.to_batches():
                    yield rb

    return sdf.mapInArrow(scan, schema=schema)
