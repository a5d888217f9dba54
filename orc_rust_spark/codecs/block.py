"""ORC block compression framing: every stream is split into <= 256 KiB
blocks, each preceded by a 3-byte little-endian header
``(compressed_length << 1) | is_original`` — if the codec does not shrink a
block, the original bytes are stored with is_original = 1.

(reference parity: src/compression.rs:31,104-213 — the reference *reads*
zlib/snappy/lzo/lz4/zstd; its writer emits CompressionKind::None. Our writer
compresses with zlib (raw deflate) or zstd when available, and NONE.)
"""

from __future__ import annotations

import zlib

DEFAULT_BLOCK_SIZE = 256 * 1024

try:  # zstd is optional in this environment
    import zstandard as _zstd  # type: ignore

    _HAS_ZSTD = True
except Exception:  # pragma: no cover
    _zstd = None
    _HAS_ZSTD = False


def _compress_one(codec: str, raw: bytes, level: int) -> bytes:
    if codec == "zlib":
        c = zlib.compressobj(level, zlib.DEFLATED, -15)  # raw deflate per ORC
        return c.compress(raw) + c.flush()
    if codec == "zstd":
        return _zstd.ZstdCompressor(level=level).compress(raw)
    if codec == "lzma":
        import lzma

        return lzma.compress(raw, preset=min(level, 6))
    raise ValueError(f"unknown block codec {codec!r}")


def _decompress_one(codec: str, comp: bytes) -> bytes:
    if codec == "zlib":
        return zlib.decompress(comp, -15)
    if codec == "zstd":
        return _zstd.ZstdDecompressor().decompress(comp)
    if codec == "lzma":
        import lzma

        return lzma.decompress(comp)
    raise ValueError(f"unknown block codec {codec!r}")


def available_codecs() -> list[str]:
    # the reference reads zlib/snappy/lzo/lz4/zstd (src/compression.rs:142-213);
    # this container ships zlib + lzma (zstd when the module exists) — the
    # block framing is codec-agnostic either way
    return ["none", "zlib", "lzma"] + (["zstd"] if _HAS_ZSTD else [])


def compress_stream(
    raw: bytes, codec: str = "zlib", block_size: int = DEFAULT_BLOCK_SIZE, level: int = 3
) -> bytes:
    """Frame + compress a stream. codec='none' returns raw bytes unframed."""
    if codec == "none":
        return raw
    out = bytearray()
    for i in range(0, len(raw), block_size):
        block = raw[i : i + block_size]
        comp = _compress_one(codec, block, level)
        if len(comp) < len(block):
            header = len(comp) << 1
            out.extend(header.to_bytes(3, "little"))
            out.extend(comp)
        else:
            header = (len(block) << 1) | 1
            out.extend(header.to_bytes(3, "little"))
            out.extend(block)
    return bytes(out)


def decompress_stream(buf: bytes, codec: str = "zlib") -> bytes:
    if codec == "none":
        return buf
    out = bytearray()
    pos = 0
    n = len(buf)
    while pos < n:
        header = int.from_bytes(buf[pos : pos + 3], "little")
        pos += 3
        length = header >> 1
        chunk = buf[pos : pos + length]
        pos += length
        out.extend(chunk if header & 1 else _decompress_one(codec, chunk))
    return bytes(out)
