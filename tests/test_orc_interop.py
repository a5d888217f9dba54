"""ORC stream-level interop: files written by an INDEPENDENT writer
(pyarrow.orc) are decoded by this engine's own codecs — the analog of the
reference's integration suite over official example files
(tests/integration/main.rs:18-88)."""

import datetime
import decimal

import numpy as np
import pyarrow as pa
import pyarrow.orc as paorc
import pytest

from orc_rust_spark.sources.orc_file import orc_to_table, read_metadata


def _alltypes(n=20000, seed=11):
    rng = np.random.default_rng(seed)
    return pa.table({
        "id": pa.array(np.arange(n)),
        "small": pa.array(rng.integers(-100, 100, n), type=pa.int32()),
        "tiny": pa.array(rng.integers(-128, 128, n), type=pa.int8()),
        "flag": pa.array(rng.choice([True, False], n)),
        "price": pa.array(rng.random(n) * 100, type=pa.float64()),
        "f32": pa.array(rng.random(n).astype(np.float32)),
        "name": pa.array(
            [None if rng.random() < 0.1 else f"name_{i % 50}" for i in range(n)]
        ),
        "blob": pa.array([bytes([i % 255, 1, 2]) for i in range(n)], type=pa.binary()),
        "d": pa.array(
            [datetime.date(2020, 1, 1) + datetime.timedelta(days=int(i % 1000))
             for i in range(n)]
        ),
        "dec": pa.array(
            [decimal.Decimal(f"{i}.{i % 100:02d}") for i in range(n)],
            type=pa.decimal128(12, 2),
        ),
        "ts": pa.array(
            np.int64(1_700_000_000_000_000) + rng.integers(0, 10**12, n),
            type=pa.timestamp("us"),
        ),
    })


def _assert_equal(got: pa.Table, want: pa.Table):
    assert got.num_rows == want.num_rows
    for col in want.column_names:
        g = got.column(col).combine_chunks().cast(want.schema.field(col).type)
        w = want.column(col).combine_chunks()
        assert g.equals(w), f"column {col} mismatch"


@pytest.mark.parametrize("comp", ["UNCOMPRESSED", "ZLIB", "SNAPPY", "LZ4", "ZSTD"])
def test_alltypes_interop(tmp_path, comp):
    """Every compression codec the container can produce — matching the
    reference's alltypes.{none,snappy,zlib,zstd,lz4}.orc matrix
    (tests/basic/main.rs). LZ4 exercises the pure-Python block decoder."""
    tbl = _alltypes()
    path = str(tmp_path / f"t_{comp}.orc")
    paorc.write_table(tbl, path, compression=comp)
    _assert_equal(orc_to_table(path), paorc.read_table(path))


def test_multi_stripe(tmp_path):
    tbl = _alltypes(n=200000)
    path = str(tmp_path / "multi.orc")
    paorc.write_table(tbl, path, compression="ZLIB", stripe_size=256 * 1024)
    meta = read_metadata(path)
    assert len(meta.stripes) > 1
    _assert_equal(orc_to_table(path), paorc.read_table(path))


def test_metadata_fields(tmp_path):
    tbl = _alltypes(n=1000)
    path = str(tmp_path / "m.orc")
    paorc.write_table(tbl, path, compression="ZLIB")
    meta = read_metadata(path)
    assert meta.number_of_rows == 1000
    assert meta.compression == "zlib"
    root = meta.types[0]
    assert root.field_names == list(tbl.column_names)


@pytest.mark.parametrize("comp", ["none", "zlib", "snappy", "lz4", "zstd"])
def test_write_orc_read_by_pyarrow(tmp_path, comp):
    """Write-side interop: files emitted by OUR writer (our RLEv2/byte/
    boolean/float/decimal/timestamp encoders + hand-built protobuf tail)
    are read back bit-identically by pyarrow's liborc reader — the
    ArrowWriter roundtrip analog (src/arrow_writer.rs:281-535)."""
    from orc_rust_spark.sources.orc_file import write_orc

    tbl = _alltypes(n=30000)
    path = str(tmp_path / f"ours_{comp}.orc")
    write_orc(tbl, path, compression=comp, stripe_rows=12000)  # multi-stripe
    back = paorc.read_table(path)
    for col in tbl.column_names:
        g = back.column(col).combine_chunks().cast(tbl.schema.field(col).type)
        assert g.equals(tbl.column(col).combine_chunks()), col
    # and by our own reader (self-consistency)
    _assert_equal(orc_to_table(path), back)


def test_write_orc_dictionary_encoding(tmp_path):
    """Low-cardinality strings go through DICTIONARY_V2 in our writer and
    come back via pyarrow (string.rs:190-229 decode contract)."""
    from orc_rust_spark.sources.orc_file import write_orc

    n = 20000
    tbl = pa.table({"lang": pa.array([f"l{i % 5}" for i in range(n)])})
    path = str(tmp_path / "dict.orc")
    write_orc(tbl, path, compression="zlib")
    back = paorc.read_table(path)
    assert back.column("lang").combine_chunks().equals(tbl.column("lang").combine_chunks())


def test_stripe_stats_pruning(tmp_path):
    """Metadata StripeStatistics parse + stripe-level predicate pushdown
    (reference stripe pruning over stats)."""
    import numpy as np

    from orc_rust_spark.sources.orc_file import prune_stripes, read_metadata

    n = 100000
    rng = np.random.default_rng(4)
    # payload must be incompressible enough that liborc actually splits
    pay = [rng.bytes(64).hex() for _ in range(n)]
    tbl = pa.table({"id": pa.array(np.arange(n)), "name": pa.array(pay)})
    path = str(tmp_path / "sorted.orc")
    paorc.write_table(tbl, path, compression="ZLIB", stripe_size=1024 * 1024)
    meta = read_metadata(path)
    assert len(meta.stripes) > 2
    assert len(meta.stripe_stats) == len(meta.stripes)
    # a point near the max id lives in the last stripe only
    keep = prune_stripes(meta, "id", lo=n - 5, hi=n - 5)
    assert len(keep) == 1 and keep[0] == len(meta.stripes) - 1
    # full range keeps everything
    assert len(prune_stripes(meta, "id", lo=0)) == len(meta.stripes)
    # unknown column -> three-valued keep-all
    assert len(prune_stripes(meta, "nope", lo=1)) == len(meta.stripes)


def test_orc_scan_with_predicate(spark, tmp_path):
    import numpy as np

    from orc_rust_spark.sources.orc_file import orc_scan

    rng = np.random.default_rng(9)
    n = 100000
    tbl = pa.table({"id": pa.array(np.arange(n)),
                    "pay": pa.array([rng.bytes(32).hex() for _ in range(n)])})
    path = str(tmp_path / "pred.orc")
    paorc.write_table(tbl, path, compression="ZLIB", stripe_size=512 * 1024)
    df = orc_scan(spark, path, schema="id long, pay string",
                  predicate=("id", n - 100, None))
    got = sorted(r.id for r in df.where(f"id >= {n - 100}").collect())
    assert got == list(range(n - 100, n))


def test_orc_scan_distributed(spark, tmp_path):
    tbl = _alltypes(n=60000)
    path = str(tmp_path / "scan.orc")
    paorc.write_table(tbl, path, compression="ZLIB", stripe_size=512 * 1024)
    from orc_rust_spark.sources.orc_file import orc_scan

    df = orc_scan(
        spark, path,
        schema="id long, small int, tiny byte, flag boolean, price double, "
               "f32 float, name string, blob binary, d date, "
               "dec decimal(12,2), ts timestamp_ntz",
    )
    assert df.count() == 60000
    s = df.agg({"id": "sum"}).collect()[0][0]
    assert s == sum(range(60000))
