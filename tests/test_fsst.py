import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from orc_rust_spark.codecs.fsst import (
    ESCAPE,
    FsstTable,
    fsst_decode,
    fsst_encode,
    train_fsst,
)


def _offsets(strings: list[bytes]) -> tuple[bytes, np.ndarray]:
    data = b"".join(strings)
    off = np.zeros(len(strings) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in strings], out=off[1:])
    return data, off


def _roundtrip(strings: list[bytes], table: FsstTable) -> None:
    data, off = _offsets(strings)
    enc, enc_off = fsst_encode(data, off, table)
    dec, dec_off = fsst_decode(enc, enc_off, table)
    assert dec == data
    assert dec_off.tolist() == off.tolist()


def test_known_table_compresses():
    table = FsstTable([b"http://", b"www.", b".com/", b"example"])
    strings = [b"http://www.example.com/a", b"http://www.example.com/bb"]
    data, off = _offsets(strings)
    enc, enc_off = fsst_encode(data, off, table)
    assert len(enc) < len(data) / 2
    dec, dec_off = fsst_decode(enc, enc_off, table)
    assert dec == data and dec_off.tolist() == off.tolist()


def test_escape_only_table():
    # empty table -> every byte escapes, output = 2x input
    table = FsstTable([])
    strings = [b"abc", b"", b"\xff\xff"]
    data, off = _offsets(strings)
    enc, enc_off = fsst_encode(data, off, table)
    assert len(enc) == 2 * len(data)
    dec, dec_off = fsst_decode(enc, enc_off, table)
    assert dec == data and dec_off.tolist() == off.tolist()


def test_escape_byte_in_data():
    # 0xff both as literal and adjacent to symbols
    table = FsstTable([b"ab", b"\xffz"])
    _roundtrip([b"ab\xff\xffzab", b"\xff", b"\xff\xff\xff"], table)


def test_longest_match_wins():
    table = FsstTable([b"a", b"ab", b"abc"])
    data, off = _offsets([b"abcab"])
    enc, enc_off = fsst_encode(data, off, table)
    # greedy: abc + ab = 2 tokens
    assert len(enc) == 2
    dec, _ = fsst_decode(enc, enc_off, table)
    assert dec == b"abcab"


def test_train_on_urls_wins_big():
    urls = [f"https://host-{i % 50}.example.com/path/to/page/{i}".encode() for i in range(2000)]
    sample = b"".join(urls[:200])
    table = train_fsst(sample)
    data, off = _offsets(urls)
    enc, enc_off = fsst_encode(data, off, table)
    ratio = len(data) / len(enc)
    assert ratio > 2.0, f"FSST must win on url-like strings, got {ratio:.2f}x"
    dec, dec_off = fsst_decode(enc, enc_off, table)
    assert dec == data and dec_off.tolist() == off.tolist()


def test_table_serialization():
    table = train_fsst(b"the quick brown fox jumps over the lazy dog " * 50)
    clone = FsstTable.deserialize(table.serialize())
    assert clone.symbols == table.symbols
    _roundtrip([b"the quick brown fox", b"lazy dog"], clone)


def test_empty_inputs():
    table = FsstTable([b"x"])
    _roundtrip([], table)
    _roundtrip([b"", b""], table)
    assert train_fsst(b"").symbols == []


@given(st.lists(st.binary(min_size=0, max_size=60), min_size=1, max_size=80))
@settings(max_examples=30, deadline=None)
def test_roundtrip_random_binary(strings):
    sample = b"".join(strings)
    table = train_fsst(sample, iterations=2)
    _roundtrip(strings, table)


@given(st.lists(st.text(alphabet="abcdef /:.", min_size=0, max_size=100), min_size=1, max_size=60))
@settings(max_examples=30, deadline=None)
def test_roundtrip_texty(strings):
    bs = [s.encode() for s in strings]
    table = train_fsst(b"".join(bs), iterations=3)
    _roundtrip(bs, table)


def test_selector_trial_routes_urls_by_block_codec():
    """Round 5: the FSST decision is a measured trial through the
    downstream block codec. On URL shapes, direct+zlib/zstd is SMALLER
    than fsst+zlib/zstd (the block codec re-finds FSST's symbol
    redundancy), so the unforced choice under a block codec is 'direct';
    with no block codec FSST wins outright; force_codec='fsst' pins it
    for the coverage-gate query."""
    import pyarrow as pa

    from orc_rust_spark.codecs.fsst import train_fsst
    from orc_rust_spark.operators.encode import encode_chunk

    urls = pa.array([
        f"https://crawl.example.org/archive/src{i % 20}/page-{i}.html?lang=en"
        for i in range(5000)
    ])
    table = train_fsst("".join(urls.to_pylist()[:256]).encode())

    def data_codec(plan):
        batch = encode_chunk(pa.table({"url": urls}), 0, 0, {"url": plan})
        return {r["codec"] for r in batch.to_pylist()
                if r["column"] == "url" and r["stream_kind"] == "DATA"}

    tser = table.serialize()
    # no block codec: FSST's 2.4x standalone gain wins the trial
    assert data_codec({"fsst_table": tser, "block_codec": "none"}) == {"fsst"}
    # with zstd, the trial measures direct+zstd as smaller on the sample
    assert data_codec({"fsst_table": tser, "block_codec": "zstd"}) == {"direct"}
    # whatever a block codec's trial decides, it must AGREE with its own
    # recorded sample measurements (mechanism, not boundary noise)
    from orc_rust_spark.codecs.selector import (
        FSST_FINAL_ADVANTAGE, choose_string_codec, string_chunk_stats)
    from orc_rust_spark.codecs.fsst import FsstTable

    arr = urls.cast(pa.large_binary())
    for bc in ("zlib", "zstd"):
        codec, detail = choose_string_codec(
            arr, string_chunk_stats(arr), FsstTable.deserialize(tser),
            block_codec=bc)
        scale = detail["total_bytes"] / max(1, detail["trial_sample_bytes"])
        fsst_total = (detail["fsst_final_bytes"] * scale
                      + detail["symbol_table_bytes"])
        direct_total = detail["direct_final_bytes"] * scale
        expected = ("fsst" if fsst_total <= direct_total * FSST_FINAL_ADVANTAGE
                    else "direct")
        assert codec == expected, (bc, detail)
    # the coverage gate pins fsst explicitly
    assert data_codec({"fsst_table": tser, "block_codec": "zlib",
                       "force_codec": "fsst"}) == {"fsst"}
