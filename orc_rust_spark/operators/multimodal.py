"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs over
mapInPandas.

The Spark-side plumbing (schema, batching, partition behavior, UDF
signatures) is real and tested; the actual media decoding is STUBBED —
the image/audio libraries are not in this container. ``decode_image``
raises NotImplementedError unless ``fake=True``, in which case a
deterministic fake decoder parses our synthetic 16-byte header instead,
so the pipeline shape is exercised end to end.

Fake media header (deterministic, produced by make_fake_media):
    bytes 0-3   magic b'FAKE'
    bytes 4-7   width  (uint32 LE)
    bytes 8-11  height (uint32 LE)
    bytes 12-15 n_frames (uint32 LE)
    rest        payload
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("mime", T.StringType(), False),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("payload_bytes", T.LongType(), False),
        T.StructField("sampled_frames", T.ArrayType(T.IntegerType()), True),
    ]
)


def make_fake_media(media_id: int, kind: str = "image") -> bytes:
    rng = np.random.default_rng(media_id)
    w, h, nf = int(rng.integers(16, 4096)), int(rng.integers(16, 4096)), int(rng.integers(1, 300))
    payload = rng.integers(0, 256, size=int(rng.integers(64, 2048)), dtype=np.uint8).tobytes()
    return struct.pack("<4sIII", b"FAKE", w, h, nf) + payload


def synth_media_table(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic ARITHMETIC fake-media table: header fields are simple
    functions of the id (no RNG), so an external SQL engine can predict
    the extracted features exactly — this is what lets the multimodal
    plumbing carry a value-level oracle while real decode stays stubbed.

        width  = id*7919   % 4080 + 16
        height = id*104729 % 4080 + 16
        frames = id*31     % 299  + 1
        payload length = id % 1500 + 64  (constant filler byte id % 251)
    """

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_np = pdf[id_col].to_numpy().astype(np.int64)
            payloads = []
            for i in ids_np:
                i = int(i)  # np.int64 would wrap i*104729 past ~8.8e13
                w = i * 7919 % 4080 + 16
                h = i * 104729 % 4080 + 16
                nf = i * 31 % 299 + 1
                body = bytes([int(i % 251)]) * int(i % 1500 + 64)
                payloads.append(struct.pack("<4sIII", b"FAKE", w, h, nf) + body)
            yield pd.DataFrame(
                {
                    "media_id": ids_np,
                    "kind": ["image"] * len(ids_np),
                    "payload": payloads,
                    "mime": ["image/fake"] * len(ids_np),
                }
            )

    return ids.mapInPandas(synth, schema=MEDIA_SCHEMA)


def _parse_fake_header(b: bytes) -> tuple[int, int, int]:
    magic, w, h, nf = struct.unpack_from("<4sIII", b)
    if magic != b"FAKE":
        raise ValueError("not a fake media payload")
    return w, h, nf


def decode_image(payload: bytes, fake: bool = False):
    """Decode an image payload to (width, height). Real decoding requires
    an imaging library not present in this container."""
    if not fake:
        raise NotImplementedError(
            "real image decoding is stubbed: no imaging library in this environment"
        )
    w, h, _ = _parse_fake_header(payload)
    return w, h


def extract_media_features(
    media: DataFrame, frame_stride: int = 30, fake: bool = True
) -> DataFrame:
    """mapInPandas feature extraction: header metadata + frame sampling.

    Batch shape: the UDF receives Arrow-sized pandas batches; per batch it
    does one vectorized pass over the binary column (header slices via a
    list comprehension over memoryviews — bounded, header-only; the
    payload itself is never copied row-by-row).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            if fake:
                hdrs = [_parse_fake_header(bytes(b[:16])) for b in payloads]
            else:  # pragma: no cover - real decode path is stubbed
                raise NotImplementedError("real media decoding is stubbed")
            w = np.array([x[0] for x in hdrs], dtype=np.int32)
            h = np.array([x[1] for x in hdrs], dtype=np.int32)
            nf = np.array([x[2] for x in hdrs], dtype=np.int32)
            sizes = payloads.map(len).astype(np.int64)
            frames = [list(range(0, int(n), frame_stride)) for n in nf]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": w,
                    "height": h,
                    "n_frames": nf,
                    "payload_bytes": sizes,
                    "sampled_frames": frames,
                }
            )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)
