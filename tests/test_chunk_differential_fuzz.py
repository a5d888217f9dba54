"""Chunk-table engine fuzz (r7): the same random typed tables as the ORC
write fuzz must round-trip encode_chunk -> decode_chunk_arrays exactly —
the chunk container is the engine's primary Spark transport
(mapInArrow), so its assembly paths (PRESENT spacing, LENGTH offsets,
dictionary remap, per-plan codec flips) deserve the same property-level
sweep as the file format."""

import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from pyspark.sql import types as T

from orc_rust_spark.operators.decode import decode_chunk_arrays
from orc_rust_spark.operators.encode import encode_chunk
from tests.test_differential_write_fuzz import tables

_SPARK_TYPES = {
    "i": T.LongType(),
    "s": T.StringType(),
    "f": T.DoubleType(),
    "t": T.TimestampType(),
    "l": T.ArrayType(T.LongType()),
    "b": T.BooleanType(),
    "d": T.DateType(),
    "e": T.DecimalType(13, 2),
    "c": T.StringType(),
    "y": T.BinaryType(),
    "r": T.StructType([T.StructField("a", T.LongType()),
                       T.StructField("b", T.StringType())]),
}


@pytest.mark.parametrize("plan", [{}, {"*": {"block_codec": "zstd"}}],
                         ids=["raw", "zstd-blocks"])
@given(tbl=tables())
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_chunk_roundtrip_random_tables(plan, tbl):
    col_plan = ({} if not plan else
                {name: dict(plan["*"]) for name in tbl.column_names})
    batch = encode_chunk(tbl, part_id=0, chunk_ord=0, plan=col_plan)
    out = decode_chunk_arrays(
        batch.to_pylist(),
        {name: _SPARK_TYPES[name] for name in tbl.column_names})
    for name in tbl.column_names:
        want = tbl.column(name).combine_chunks()
        got = out[name].cast(want.type)
        assert got.equals(want), f"column {name} mismatch"
