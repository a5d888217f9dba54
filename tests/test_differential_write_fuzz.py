"""Whole-file differential property test (r7): random typed tables pass
through ``write_orc`` and must read back EQUAL via BOTH liborc (pyarrow)
and this engine's own reader — the write-side analog of the official-
fixture read sweep (the reference pins its writer the same way, via
arrow_writer roundtrip proptests, src/arrow_writer.rs test module).

Per-codec Hypothesis roundtrips already cover stream-level edge cases;
this layer catches cross-stream assembly bugs (PRESENT spacing vs
LENGTH streams, dictionary vs direct flips, stripe splits, index
emission) that only appear at file granularity."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.orc as paorc
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from orc_rust_spark.sources.orc_file import orc_to_table, write_orc

# liborc's ns reads bound timestamps to ~1677-2262
_TS_LO, _TS_HI = -9_214_560_000_000_000, 9_214_560_000_000_000


def _col_ints(draw, n):
    return pa.array(
        draw(st.lists(st.one_of(st.none(),
                                st.integers(-(2**63), 2**63 - 1)),
                      min_size=n, max_size=n)),
        type=pa.int64())


def _col_strings(draw, n):
    return pa.array(
        draw(st.lists(st.one_of(st.none(), st.text(max_size=12)),
                      min_size=n, max_size=n)),
        type=pa.string())


def _col_floats(draw, n):
    return pa.array(
        draw(st.lists(st.one_of(st.none(),
                                st.floats(allow_nan=False,
                                          allow_infinity=True,
                                          width=64)),
                      min_size=n, max_size=n)),
        type=pa.float64())


def _col_ts(draw, n):
    return pa.array(
        draw(st.lists(st.one_of(st.none(),
                                st.integers(_TS_LO, _TS_HI)),
                      min_size=n, max_size=n)),
        type=pa.int64()).cast(pa.timestamp("us"))


def _col_lists(draw, n):
    return pa.array(
        draw(st.lists(st.one_of(
            st.none(),
            st.lists(st.integers(-(2**31), 2**31), max_size=4)),
            min_size=n, max_size=n)),
        type=pa.list_(pa.int64()))


def _col_bools(draw, n):
    return pa.array(
        draw(st.lists(st.one_of(st.none(), st.booleans()),
                      min_size=n, max_size=n)),
        type=pa.bool_())


def _col_dates(draw, n):
    return pa.array(
        draw(st.lists(st.one_of(st.none(),
                                st.integers(-719_162, 2_932_896)),
                      min_size=n, max_size=n)),
        type=pa.int32()).cast(pa.date32())


def _col_decimals(draw, n):
    import decimal as _d
    vals = draw(st.lists(st.one_of(st.none(),
                                   st.integers(-(10**11), 10**11)),
                         min_size=n, max_size=n))
    return pa.array([None if v is None else _d.Decimal(v) / 100
                     for v in vals], type=pa.decimal128(13, 2))


def _col_lowcard(draw, n):
    # low-cardinality strings flip the writer to DICTIONARY_V2
    pool = ["en", "de", "fr", "", "zh-\u4e2d\u6587"]
    return pa.array(
        draw(st.lists(st.one_of(st.none(), st.sampled_from(pool)),
                      min_size=n, max_size=n)),
        type=pa.string())


def _col_binary(draw, n):
    return pa.array(
        draw(st.lists(st.one_of(st.none(), st.binary(max_size=8)),
                      min_size=n, max_size=n)),
        type=pa.binary())


def _col_structs(draw, n):
    typ = pa.struct([("a", pa.int64()), ("b", pa.string())])
    return pa.array(
        draw(st.lists(st.one_of(
            st.none(),
            st.fixed_dictionaries({
                "a": st.one_of(st.none(), st.integers(-(2**40), 2**40)),
                "b": st.one_of(st.none(), st.text(max_size=6)),
            })),
            min_size=n, max_size=n)),
        type=typ)


_MAKERS = {"i": _col_ints, "s": _col_strings, "f": _col_floats,
           "t": _col_ts, "l": _col_lists, "b": _col_bools,
           "d": _col_dates, "e": _col_decimals, "c": _col_lowcard,
           "y": _col_binary, "r": _col_structs}


@st.composite
def tables(draw):
    n = draw(st.integers(0, 120))
    kinds = draw(st.lists(st.sampled_from(sorted(_MAKERS)),
                          min_size=1, max_size=3, unique=True))
    return pa.table({k: _MAKERS[k](draw, n) for k in kinds})


@pytest.mark.parametrize("comp,extra", [
    ("zlib", {}),
    ("zstd", {}),
    # legacy DIRECT(v1) integer streams + bloom emission under random data
    ("zlib", {"rle_version": 1, "bloom_columns": ["i"]}),
], ids=["zlib", "zstd", "zlib-rlev1-bloom"])
@given(tbl=tables())
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_write_orc_differential_roundtrip(tmp_path, comp, extra, tbl):
    kw = dict(extra)
    if "bloom_columns" in kw and "i" not in tbl.column_names:
        kw.pop("bloom_columns")
    path = str(tmp_path / f"fuzz_{comp}_{os.getpid()}.orc")
    # small stripes + tiny stride exercise stripe splits and index paths
    write_orc(tbl, path, compression=comp, stripe_rows=40,
              row_index_stride=16, **kw)
    ours = orc_to_table(path)
    assert ours.cast(tbl.schema).equals(tbl), "self-read mismatch"
    ref = paorc.ORCFile(path).read()
    assert ref.num_rows == tbl.num_rows
    assert ref.cast(tbl.schema).equals(tbl), "liborc read mismatch"
