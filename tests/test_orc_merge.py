"""Stripe-copy ORC compaction (sources/orc_merge).

The merge must be ZERO-decode — stripes ride verbatim — so the bar is:
(1) the merged file's rows are bit-identical to the concatenation of
the inputs, under BOTH our reader and liborc (pyarrow.orc); (2) every
in-stripe structure survives intact (stripe statistics keep pruning,
bloom filters keep point lookups, row indexes keep seeks); (3) merges
that cannot be expressed by stripe copy (schema / compression / stride
mismatches) refuse loudly instead of writing a lying file.
"""

import json

import numpy as np
import pyarrow as pa
import pyarrow.fs as pafs
import pyarrow.orc as paorc
import pytest

from orc_rust_spark.sources import fsio, orc_file as of
from orc_rust_spark.sources.orc_merge import (
    compact_orc,
    merge_orc_files,
    plan_bins,
)


def _table(i: int, n: int = 1000) -> pa.Table:
    return pa.table({
        "k": pa.array(np.arange(i * n, (i + 1) * n, dtype=np.int64)),
        "s": pa.array([f"doc-{i}-{j:04d}" for j in range(n)]),
        "f": pa.array(np.linspace(0.0, 1.0, n) + i),
        "b": pa.array([None if j % 7 == 0 else j % 2 == 0
                       for j in range(n)]),
    })


def _write_inputs(tmp_path, n_files=3, compression="zstd", **kw):
    paths, tables = [], []
    for i in range(n_files):
        t = _table(i)
        p = str(tmp_path / f"in-{i}.orc")
        of.write_orc(t, p, compression=compression, stripe_rows=300, **kw)
        paths.append(p)
        tables.append(t)
    return paths, pa.concat_tables(tables)


def test_merge_rows_bit_identical_both_readers(tmp_path):
    paths, expect = _write_inputs(tmp_path)
    res = merge_orc_files(paths, str(tmp_path / "merged.orc"))
    assert res["files"] == 3 and res["rows"] == expect.num_rows
    got = of.orc_to_table(str(tmp_path / "merged.orc"))
    assert got.cast(expect.schema).equals(expect)
    lib = paorc.ORCFile(str(tmp_path / "merged.orc")).read()
    assert lib.cast(expect.schema).equals(expect)


def test_merge_is_pure_byte_copy_of_stripes(tmp_path):
    """The output's stripe region is the inputs' stripe bytes verbatim,
    in order — the zero-decode claim checked at the byte level."""
    paths, _ = _write_inputs(tmp_path)
    merge_orc_files(paths, str(tmp_path / "merged.orc"))
    out = open(tmp_path / "merged.orc", "rb").read()
    pos = 3  # past MAGIC
    for p in paths:
        meta = of.read_metadata(p)
        raw = open(p, "rb").read()
        for si in meta.stripes:
            length = si.index_length + si.data_length + si.footer_length
            assert out[pos: pos + length] == \
                raw[si.offset: si.offset + length]
            pos += length


def test_merge_preserves_stripe_stats_pruning(tmp_path):
    """Metadata stripe statistics ride through: pruning on the merged
    file keeps exactly the stripes whose k-range matches."""
    paths, _ = _write_inputs(tmp_path)
    merge_orc_files(paths, str(tmp_path / "merged.orc"))
    meta = of.read_metadata(str(tmp_path / "merged.orc"))
    assert len(meta.stripe_stats) == len(meta.stripes) == 12
    keep = of.prune_stripes(meta, "k", lo=2500, hi=2500)
    assert len(keep) == 1  # one 300-row stripe covers k=2500


def test_merge_preserves_bloom_point_lookup(tmp_path):
    paths, _ = _write_inputs(tmp_path, bloom_columns=["k"])
    merge_orc_files(paths, str(tmp_path / "merged.orc"))
    rows, decoded, total = of.orc_point_lookup(
        str(tmp_path / "merged.orc"), "k", 1234)
    assert rows.num_rows == 1 and rows.column("k")[0].as_py() == 1234
    assert decoded < total  # indexes still prune after the copy


def test_merge_file_stats_are_the_union(tmp_path):
    """The merged footer's ColumnStatistics carry the UNION of the
    inputs' bounds and the summed counts (parsed back off the wire)."""
    from orc_rust_spark.sources.orc_merge import _read_tail_raw
    from orc_rust_spark.sources.orc_file import (_parse_column_stats,
                                                 _parse_stats_nullinfo)

    paths, expect = _write_inputs(tmp_path)
    merge_orc_files(paths, str(tmp_path / "merged.orc"))
    tail = _read_tail_raw(str(tmp_path / "merged.orc"), None)
    names = ["root", "k", "s", "f", "b"]
    raw = dict(zip(names, tail.file_stats_raw))
    assert _parse_column_stats(raw["k"]) == (0, 2999)
    assert _parse_column_stats(raw["s"]) == ("doc-0-0000", "doc-2-0999")
    n, has_null = _parse_stats_nullinfo(raw["k"])
    assert n == 3000 and has_null is False
    nb, b_null = _parse_stats_nullinfo(raw["b"])
    assert b_null is True and nb == sum(
        1 for j in range(1000) if j % 7) * 3


def test_merge_foreign_liborc_inputs(tmp_path):
    """Files WRITTEN by liborc merge too (stride/compression parity) and
    read back identically under both readers."""
    tables = [_table(i) for i in range(2)]
    paths = []
    for i, t in enumerate(tables):
        p = str(tmp_path / f"lib-{i}.orc")
        paorc.write_table(t, p, compression="zlib", stripe_size=64 * 1024)
        paths.append(p)
    expect = pa.concat_tables(tables)
    merge_orc_files(paths, str(tmp_path / "m.orc"))
    assert paorc.ORCFile(str(tmp_path / "m.orc")).read() \
        .cast(expect.schema).equals(expect)
    assert of.orc_to_table(str(tmp_path / "m.orc")) \
        .cast(expect.schema).equals(expect)


def test_merge_nested_types(tmp_path):
    t = pa.table({
        "id": pa.array(np.arange(100, dtype=np.int64)),
        "tags": pa.array([[f"t{j}", f"u{j}"] for j in range(100)]),
        "pt": pa.array([{"x": float(j), "y": -float(j)} for j in range(100)],
                       type=pa.struct([("x", pa.float64()),
                                       ("y", pa.float64())])),
    })
    for i in range(2):
        of.write_orc(t, str(tmp_path / f"n-{i}.orc"), compression="zlib",
                     stripe_rows=40)
    merge_orc_files([str(tmp_path / "n-0.orc"), str(tmp_path / "n-1.orc")],
                    str(tmp_path / "nm.orc"))
    expect = pa.concat_tables([t, t])
    got = of.orc_to_table(str(tmp_path / "nm.orc"))
    assert got.cast(expect.schema).equals(expect)
    assert paorc.ORCFile(str(tmp_path / "nm.orc")).read() \
        .cast(expect.schema).equals(expect)


def test_merge_refuses_schema_mismatch(tmp_path):
    of.write_orc(_table(0), str(tmp_path / "a.orc"))
    of.write_orc(_table(0).drop_columns(["b"]), str(tmp_path / "b.orc"))
    with pytest.raises(ValueError, match="schemas differ"):
        merge_orc_files([str(tmp_path / "a.orc"), str(tmp_path / "b.orc")],
                        str(tmp_path / "m.orc"))
    assert not (tmp_path / "m.orc").exists()  # tmp-then-rename: no debris


def test_merge_refuses_compression_mismatch(tmp_path):
    of.write_orc(_table(0), str(tmp_path / "a.orc"), compression="zstd")
    of.write_orc(_table(0), str(tmp_path / "b.orc"), compression="zlib")
    with pytest.raises(ValueError, match="compression"):
        merge_orc_files([str(tmp_path / "a.orc"), str(tmp_path / "b.orc")],
                        str(tmp_path / "m.orc"))


def test_merge_refuses_stride_mismatch(tmp_path):
    of.write_orc(_table(0), str(tmp_path / "a.orc"), row_index_stride=10_000)
    of.write_orc(_table(0), str(tmp_path / "b.orc"), row_index_stride=5_000)
    with pytest.raises(ValueError, match="rowIndexStride"):
        merge_orc_files([str(tmp_path / "a.orc"), str(tmp_path / "b.orc")],
                        str(tmp_path / "m.orc"))


def test_merge_single_file_is_a_rewrite(tmp_path):
    paths, expect0 = _write_inputs(tmp_path, n_files=1)
    merge_orc_files(paths, str(tmp_path / "m.orc"))
    got = of.orc_to_table(str(tmp_path / "m.orc"))
    assert got.cast(expect0.schema).equals(expect0)


def test_merge_through_subtree_fs_uri(tmp_path):
    """End-to-end through a registered non-local filesystem whose paths
    are subtree-relative: any builtin open/glob left in the path fails."""
    fs = pafs.SubTreeFileSystem(str(tmp_path), pafs.LocalFileSystem())
    fsio.register_filesystem("mergefs", fs)
    try:
        paths, expect = _write_inputs(tmp_path, n_files=2)
        uris = [f"mergefs://in-{i}.orc" for i in range(2)]
        res = merge_orc_files(uris, "mergefs://merged.orc")
        assert res["rows"] == expect.num_rows
        got = of.orc_to_table(str(tmp_path / "merged.orc"))
        assert got.cast(expect.schema).equals(expect)
    finally:
        fsio.unregister_filesystem("mergefs")


def test_plan_bins_first_fit_decreasing():
    sizes = [("a", 60), ("b", 50), ("c", 40), ("d", 30), ("e", 10)]
    bins = plan_bins(sizes, target_bytes=100)
    assert sorted(len(b) for b in bins) == [2, 3]
    assert all(sum(dict(sizes)[p] for p in b) <= 100 for b in bins)
    # oversized file gets its own bin, never split
    assert plan_bins([("big", 500)], 100) == [["big"]]
    # deterministic across orderings
    assert plan_bins(list(reversed(sizes)), 100) == bins


def test_compact_orc_distributed(tmp_path, spark):
    src = tmp_path / "src"
    src.mkdir()
    paths, expect = _write_inputs(src, n_files=6)
    manifest = compact_orc(spark, str(src), str(tmp_path / "out"),
                           target_bytes=1 << 30).collect()
    assert len(manifest) == 1  # 6 small files fit one bin
    row = manifest[0]
    assert row.n_files == 6 and row.n_rows == expect.num_rows
    got = of.orc_to_table(row.out_path)
    # compaction orders by bin packing (size-desc) — compare as multiset
    import pyarrow.compute as pc

    assert got.num_rows == expect.num_rows
    assert got.sort_by("k").cast(expect.schema) \
        .equals(expect.sort_by("k"))
    # inputs are NOT deleted (caller swaps after verifying)
    assert len(list(src.glob("*.orc"))) == 6


def test_compact_orc_multiple_bins(tmp_path, spark):
    src = tmp_path / "src"
    src.mkdir()
    paths, expect = _write_inputs(src, n_files=4)
    size = max(fsio.file_size(p) for p in paths)
    manifest = compact_orc(spark, str(src), str(tmp_path / "out"),
                           target_bytes=2 * size).collect()
    assert len(manifest) >= 2
    parts = [of.orc_to_table(r.out_path) for r in manifest]
    got = pa.concat_tables(parts).sort_by("k")
    assert got.cast(expect.schema).equals(expect.sort_by("k"))
    assert json.loads(json.dumps([r.n_rows for r in manifest]))  # plain ints
