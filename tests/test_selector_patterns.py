"""FIXTURES.md §3: per-pattern selector outcomes (mirrors the reference's
test.orc fixture columns and the expected encodings asserted at
tests/basic/main.rs:200-233)."""

import numpy as np
import pyarrow as pa

from orc_rust_spark.codecs.fsst import train_fsst
from orc_rust_spark.codecs.rle_v2 import encode_rlev2
from orc_rust_spark.codecs.selector import choose_string_codec, string_chunk_stats


def _enc_kind(first_byte: int) -> str:
    return ["short_repeat", "direct", "patched_base", "delta"][first_byte >> 6]


def test_int_short_repeated():
    # [5,5,None,5,5] -> nulls stripped -> [5,5,5,5] -> short repeat
    enc = encode_rlev2(np.array([5, 5, 5, 5]), signed=True)
    assert _enc_kind(enc[0]) == "short_repeat"


def test_int_neg_short_repeated():
    enc = encode_rlev2(np.array([-5, -5, -5, -5]), signed=True)
    assert _enc_kind(enc[0]) == "short_repeat"
    # zigzag: -5 -> 9
    assert enc[1] == 9


def test_int_delta_asc_and_desc():
    enc = encode_rlev2(np.array([1, 2, 4, 5]), signed=True)
    assert _enc_kind(enc[0]) == "delta"
    enc = encode_rlev2(np.array([5, 4, 2, 1]), signed=True)
    assert _enc_kind(enc[0]) == "delta"


def test_int_direct():
    enc = encode_rlev2(np.array([1, 6, 3, 2]), signed=True)
    assert _enc_kind(enc[0]) == "direct"


def test_bigint_mixed():
    enc = encode_rlev2(np.array([5, -5, 1, 5, 5]), signed=True)
    assert _enc_kind(enc[0]) == "direct"


def test_patched_base_with_outliers():
    rng = np.random.default_rng(0)
    vals = rng.integers(2000, 2200, size=31)
    vals[7] = -25080
    vals[19] = 31080
    enc = encode_rlev2(vals, signed=True)
    assert _enc_kind(enc[0]) == "patched_base"
    from orc_rust_spark.codecs.rle_v2 import decode_rlev2

    assert decode_rlev2(enc, 31, signed=True).tolist() == vals.tolist()


def test_utf8_length_stream_is_delta():
    from orc_rust_spark.codecs.string_codec import encode_string_direct

    _, lengths = encode_string_direct(["a", "bb", "ccc", "dddd", "eeeee"])
    assert _enc_kind(lengths[0]) == "delta"


def test_low_cardinality_strings_pick_dictionary():
    vals = pa.array((["en", "de", "fr", "zh"] * 16)).cast(pa.large_binary())
    stats = string_chunk_stats(vals)
    codec, _ = choose_string_codec(vals, stats, None)
    assert codec == "dict"


def test_unique_short_strings_pick_fsst():
    urls = [f"https://host-{i}.example.com/p/{i}".encode() for i in range(512)]
    arr = pa.array(urls, type=pa.binary()).cast(pa.large_binary())
    table = train_fsst(b"".join(urls[:100]))
    # no downstream block codec: FSST's standalone gain decides
    codec, detail = choose_string_codec(arr, string_chunk_stats(arr), table)
    assert codec == "fsst"
    assert detail["fsst_sample_gain"] > 1.15
    # under a block codec the trial compares FINAL bytes — on this shape
    # direct+zstd is smaller, and the detail records both measurements
    codec_z, detail_z = choose_string_codec(
        arr, string_chunk_stats(arr), table, block_codec="zstd")
    assert codec_z == "direct"
    assert detail_z["direct_final_bytes"] < detail_z["fsst_final_bytes"]


def test_long_high_entropy_binary_picks_direct():
    rng = np.random.default_rng(1)
    vals = [rng.integers(0, 256, 2000, dtype=np.uint8).tobytes() for _ in range(64)]
    arr = pa.array(vals, type=pa.binary()).cast(pa.large_binary())
    codec, _ = choose_string_codec(arr, string_chunk_stats(arr), None)
    assert codec == "direct"


def test_entropy_sampled_from_chunk_not_buffer_start():
    """A sliced array shares the parent buffer: the entropy sample must
    start at the slice's first value offset (code-review r6)."""
    import numpy as np
    import pyarrow as pa

    from orc_rust_spark.codecs.selector import string_chunk_stats

    # first half all 'a' (entropy 0), second half random-ish bytes
    low = ["a" * 40] * 200
    high = [bytes(((i * 37 + j * 11) % 251 for j in range(40))).decode("latin1")
            for i in range(200)]
    arr = pa.array(low + high, type=pa.large_string()).cast(pa.large_binary())
    tail = arr.slice(200, 200)
    ent_tail = string_chunk_stats(tail)["byte_entropy"]
    ent_head = string_chunk_stats(arr.slice(0, 200))["byte_entropy"]
    assert ent_head < 0.01
    assert ent_tail > 4.0  # sampled the slice's own (high-entropy) bytes


def test_string_stats_reuse_denc_matches():
    import pyarrow as pa

    from orc_rust_spark.codecs.selector import string_chunk_stats
    from orc_rust_spark.operators.encode import sorted_dictionary

    arr = pa.array([f"v{i % 7}" for i in range(1000)]).cast(pa.large_binary())
    reuse: dict = {}
    string_chunk_stats(arr, reuse)
    assert "denc" in reuse
    fresh = sorted_dictionary(arr)
    reused = sorted_dictionary(arr, reuse["denc"])
    assert (fresh[0] == reused[0]).all() and fresh[1] == reused[1]
    assert (fresh[2] == reused[2]).all() and fresh[3] == reused[3]


def test_block_stream_zstd_no_content_size_frame():
    """RFC 8878 frames without Frame_Content_Size (streaming writers)
    must decode on the pyarrow fallback path (code-review r6)."""
    import pyarrow as pa

    from orc_rust_spark.codecs import block as blockc

    payload = b"streaming zstd frame " * 500
    sink = pa.BufferOutputStream()
    with pa.CompressedOutputStream(sink, "zstd") as f:
        f.write(payload)
    frame = sink.getvalue().to_pybytes()
    # pyarrow's streaming writer omits the content size
    import pytest as _pytest
    with _pytest.raises(ValueError):
        blockc._zstd_content_size(frame)
    framed = (len(frame) << 1).to_bytes(3, "little") + frame
    assert bytes(blockc.decompress_stream(framed, "zstd")) == payload


def test_fsst_encode_rejects_unrebased_offsets():
    import numpy as np
    import pytest as _pytest

    from orc_rust_spark.codecs.fsst import train_fsst, fsst_encode

    data = b"abcabcabc"
    table = train_fsst(data * 50)
    with _pytest.raises(ValueError, match="span"):
        fsst_encode(data, np.array([3, 6, 9, 12], dtype=np.int64), table)
