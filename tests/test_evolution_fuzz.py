"""Schema-evolution differential fuzz (r7): random corpora where every
file carries a random SUBSET of the columns, in a random ORDER, at a
random (safe) WIDTH — the shape a years-old landing directory actually
has. The union-inference + widening + conform pipeline (the driver-side
half of ``orc_scan(missing_as_null=True)``; the Spark plumbing around it
is covered deterministically in test_schema_evolution.py) must
reconstruct exactly the rows a reader that had always known the widest
schema would have seen: typed nulls where a file predates a column,
lossless upcasts where it wrote narrow."""

import os

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from orc_rust_spark.sources.orc_file import (
    arrow_schema_of,
    conform_table,
    orc_to_table,
    read_metadata,
    union_schema_ddl,
    validate_consistent_types,
    write_orc,
)

# column pool: name -> (widest arrow type, list of narrower write types).
# ts and nested struct exercise the REPRESENTATIONAL variants (decoder
# emits naive timestamp[us] and large_string children; to_arrow_schema
# of the DDL says tz-labeled / plain string) that the r7 strict conform
# guard first over-rejected — keep them in the random pool so that class
# of regression cannot reland silently.
_POOL = {
    "id": (pa.int64(), [pa.int8(), pa.int16(), pa.int32(), pa.int64()]),
    "score": (pa.float64(), [pa.float32(), pa.float64()]),
    "tag": (pa.string(), [pa.string()]),
    "flag": (pa.bool_(), [pa.bool_()]),
    "ts": (pa.timestamp("us"), [pa.timestamp("us")]),
    "meta": (pa.struct([("a", pa.string()), ("n", pa.int64())]),
             [pa.struct([("a", pa.string()), ("n", pa.int64())])]),
}


@st.composite
def corpora(draw):
    """[(columns-of-file, width-choice-per-file, rows-of-file)] with
    every column appearing in at least one file."""
    n_files = draw(st.integers(2, 4))
    files = []
    for _ in range(n_files):
        cols = draw(st.lists(st.sampled_from(sorted(_POOL)), min_size=1,
                             max_size=len(_POOL), unique=True))
        widths = {c: draw(st.sampled_from(range(len(_POOL[c][1]))))
                  for c in cols}
        n_rows = draw(st.integers(1, 20))
        files.append((cols, widths, n_rows))
    # every pool column must exist somewhere (ghost columns are a
    # separate, deterministic planning error)
    missing = set(_POOL) - {c for cols, _, _ in files for c in cols}
    if missing:
        cols, widths, n_rows = files[0]
        for c in missing:
            widths = {**widths, c: 0}
        files[0] = (sorted(set(cols) | missing), widths, n_rows)
    return files


def _values(col: str, width_idx: int, n: int, rng) -> pa.Array:
    """Random values valid at the NARROW write type (so the upcast to
    the widest type is exact), with some nulls."""
    t = _POOL[col][1][width_idx]
    mask = rng.random(n) < 0.15
    if pa.types.is_integer(t):
        hi = 2 ** (t.bit_width - 1) - 1
        vals = rng.integers(-hi - 1, hi, n)
        arr = pa.array(vals, type=t, mask=mask)
    elif pa.types.is_floating(t):
        # float32-exact values: small ints over 8 -> exact in both widths
        vals = rng.integers(-1000, 1000, n).astype("float64") / 8.0
        arr = pa.array(vals, type=t, mask=mask)
    elif pa.types.is_boolean(t):
        arr = pa.array(rng.random(n) < 0.5, type=t, mask=mask)
    elif pa.types.is_timestamp(t):
        import datetime

        base = datetime.datetime(2024, 1, 1)
        arr = pa.array(
            [base + datetime.timedelta(seconds=int(s), microseconds=int(u))
             for s, u in zip(rng.integers(0, 10**7, n),
                             rng.integers(0, 10**6, n))],
            type=t, mask=mask)
    elif pa.types.is_struct(t):
        arr = pa.array(
            [{"a": f"s{int(v)}", "n": int(v)}
             for v in rng.integers(0, 99, n)],
            type=t, mask=mask)
    else:
        arr = pa.array([f"v{int(v)}" for v in rng.integers(0, 50, n)],
                       type=t, mask=mask)
    return arr


@given(files=corpora(), seed=st.integers(0, 2**31))
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_union_widen_conform_reconstructs(spark, tmp_path_factory, files,
                                          seed):
    # ``spark``: StructType.fromDDL inside arrow_schema_of needs an
    # active session (the same dependency orc_scan itself has)
    rng = np.random.default_rng(seed)
    d = tmp_path_factory.mktemp("evofuzz")
    paths, want_parts = [], []
    for i, (cols, widths, n_rows) in enumerate(files):
        data = {c: _values(c, widths[c], n_rows, rng) for c in cols}
        # random column order in the file: conform is by name
        order = list(rng.permutation(cols))
        tbl = pa.table({c: data[c] for c in order})
        p = str(d / f"f{i}.orc")
        write_orc(tbl, p, compression="zlib")
        paths.append(p)
        # expected rows at the widest schema: upcast present, null absent
        want_parts.append(pa.table({
            c: (data[c].cast(_POOL[c][0]) if c in cols
                else pa.nulls(n_rows, type=_POOL[c][0]))
            for c in sorted(_POOL)}))
    metas = {p: read_metadata(p) for p in paths}
    validate_consistent_types(metas, allow_widening=True)
    ddl = union_schema_ddl(metas)
    target = arrow_schema_of(ddl)
    by_name = {f.name: f.type for f in target}
    got = pa.concat_tables(
        conform_table(orc_to_table(p), target).select(sorted(_POOL))
        for p in paths)
    want = pa.concat_tables(want_parts)
    # conform target may be narrower than the pool's widest when no file
    # wrote wide — cast the expectation to the inferred schema, which
    # must itself be losslessly reachable from every file (safe cast)
    want = pa.table({c: want.column(c).cast(by_name[c])
                     for c in sorted(_POOL)})
    assert got.select(sorted(_POOL)).equals(want)


def test_fuzz_smoke(spark, tmp_path):
    """One deterministic shape through the same pipeline (keeps the file
    meaningful if hypothesis is ever unavailable)."""
    a = pa.table({"id": pa.array([1, 2], type=pa.int32())})
    b = pa.table({"tag": pa.array(["x"]),
                  "id": pa.array([2**40], type=pa.int64())})
    pa_, pb = str(tmp_path / "a.orc"), str(tmp_path / "b.orc")
    write_orc(a, pa_, compression="none")
    write_orc(b, pb, compression="none")
    metas = {pa_: read_metadata(pa_), pb: read_metadata(pb)}
    target = arrow_schema_of(union_schema_ddl(metas))
    got = pa.concat_tables(
        conform_table(orc_to_table(p), target) for p in (pa_, pb))
    assert got.column("id").to_pylist() == [1, 2, 2**40]
    assert got.column("tag").to_pylist() == [None, None, "x"]
    assert got.schema.field("id").type == pa.int64()


if __name__ == "__main__":
    pytest.main([os.path.abspath(__file__), "-q"])
