import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from orc_rust_spark.codecs.timestamp_split import (
    ORC_EPOCH_SECONDS,
    combine_timestamp_ns,
    decode_timestamp,
    encode_timestamp,
    split_timestamp_ns,
)


def test_trailing_zero_trick():
    # 1000 ns -> strip 3 zeros -> (1 << 3) | (3 - 1)
    ts = np.array([ORC_EPOCH_SECONDS * 10**9 + 1000], dtype=np.int64)
    secs, enc = split_timestamp_ns(ts)
    assert secs.tolist() == [0]
    assert enc.tolist() == [(1 << 3) | 2]
    # no trailing zeros -> shifted only
    ts = np.array([7], dtype=np.int64)
    _, enc = split_timestamp_ns(ts)
    assert enc.tolist() == [7 << 3]
    # exactly 1 zero -> not stripped
    ts = np.array([10], dtype=np.int64)
    _, enc = split_timestamp_ns(ts)
    assert enc.tolist() == [10 << 3]
    # cap at 8 removed zeros: 1e8 ns
    ts = np.array([10**8], dtype=np.int64)
    _, enc = split_timestamp_ns(ts)
    assert enc.tolist() == [(1 << 3) | 7]


def test_roundtrip_2024_microsecond_values():
    base = 1_704_067_200_000_000  # 2024-01-01 in us
    us = np.arange(base, base + 10_000, 7, dtype=np.int64)
    ns = us * 1000
    data, secondary = encode_timestamp(ns)
    out = decode_timestamp(data, secondary, ns.size)
    assert (out == ns).all()


def test_negative_seconds_orc763():
    # well below epoch, nanos > 999_999 -> exercises the ORC-763 adjustment
    ns = np.array([-5 * 10**9 + 123_456_789, -10**9, -2 * 10**9 + 1], dtype=np.int64)
    secs, enc = split_timestamp_ns(ns)
    assert (combine_timestamp_ns(secs, enc) == ns).all()


def test_epoch_boundary_roundtrips_liborc_convention():
    # Through r6 the writer used the Java floor+ORC-763 convention, whose
    # inverse of the (-1s, 0) range lands on stored seconds == 0 and
    # decodes +1s off — a differential write fuzz vs liborc caught it
    # (r7). The split now truncates toward zero with a SIGNED sub-second,
    # exactly what C++ liborc writes (measured: -1 us stores enc -6),
    # and every value round-trips.
    ns = np.array([-1, -1000, -999_999_999, -(10**9), -1_500_000_000, 0, 1],
                  dtype=np.int64)
    secs, enc = split_timestamp_ns(ns)
    assert (combine_timestamp_ns(secs, enc) == ns).all()
    # byte parity with liborc's measured encoding of -1 us
    s1, e1 = split_timestamp_ns(np.array([-1000], dtype=np.int64))
    assert (s1.tolist(), e1.tolist()) == ([-1_420_070_400], [-6])


@given(st.lists(st.integers(-(2**55), 2**55), min_size=1, max_size=500))
@settings(max_examples=40, deadline=None)
def test_roundtrip_random_ns(vals):
    # the full range round-trips, (-1s, 0) included (r7 liborc-parity split)
    ns = np.array(vals, dtype=np.int64)
    data, secondary = encode_timestamp(ns)
    assert (decode_timestamp(data, secondary, ns.size) == ns).all()


def test_far_future_timestamps_roundtrip_us_space():
    """Spark timestamps past ~year 2262 overflow int64 in ns-space
    (us*1000); the us-native split/combine must roundtrip them through
    both the chunk engine and the ORC file writer (code-review r6).
    (liborc cross-read is skipped here: Arrow's ns timestamps cannot
    represent these instants at all.)"""
    import os
    import tempfile

    import pyarrow as pa

    from orc_rust_spark.sources.orc_file import orc_to_table, write_orc

    us = np.array([
        32503680000000000,        # 3000-01-01
        253402300799999999,       # 9999-12-31 23:59:59.999999
        -62135596800000000,       # year 1
        1700000000123456,         # a normal 2023 value
    ], dtype=np.int64)
    arr = pa.array(us, type=pa.int64()).cast(pa.timestamp("us"))
    tbl = pa.table({"ts": arr})
    d = tempfile.mkdtemp()
    p = os.path.join(d, "far.orc")
    write_orc(tbl, p, compression="zlib")
    back = orc_to_table(p)
    assert back.column("ts").cast(pa.timestamp("us")).combine_chunks().equals(arr)


def test_combine_ns_out_of_range_raises():
    """ns-space combine raises on values past ~2262 instead of silently
    wrapping int64 (code-review r7 — the us path got this in r6)."""
    import pytest

    from orc_rust_spark.codecs.timestamp_split import (
        ORC_EPOCH_SECONDS,
        combine_timestamp_ns,
    )

    for unix_secs in (16_725_225_600,        # year 2500
                      -62_135_596_800):      # year 1
        stored = np.array([unix_secs - ORC_EPOCH_SECONDS], dtype=np.int64)
        with pytest.raises(ValueError, match="ns-representable"):
            combine_timestamp_ns(stored, np.zeros(1, dtype=np.int64))
    # boundary-adjacent values inside the range still decode
    ok = np.array([9_000_000_000 - ORC_EPOCH_SECONDS], dtype=np.int64)
    assert combine_timestamp_ns(ok, np.zeros(1, dtype=np.int64))[0] == \
        9_000_000_000 * 10**9


def test_corrupt_secondary_stream_nanos_rejected():
    """A decoded sub-second component outside (-1e9, 1e9) can only come
    from a corrupt SECONDARY stream; both combines refuse it instead of
    wrapping int64 past the seconds bound (code-review r7, second
    pass)."""
    import pytest

    from orc_rust_spark.codecs.timestamp_split import (
        combine_timestamp_ns,
        combine_timestamp_us,
    )

    # enc = nanos << 3 with zero trailing-zero code -> nanos = 2e9
    bad = np.array([2_000_000_000 << 3], dtype=np.int64)
    secs = np.zeros(1, dtype=np.int64)
    for combine in (combine_timestamp_ns, combine_timestamp_us):
        with pytest.raises(ValueError, match="corrupt"):
            combine(secs, bad)


def test_negative_boundary_liborc_both_directions(tmp_path):
    """-1 us and friends cross liborc in BOTH directions exactly (r7:
    the differential write fuzz caught our floor-convention writer
    storing -1 us as +999999 us; now trunc+signed-nanos, liborc
    parity)."""
    import pyarrow as pa
    import pyarrow.orc as paorc

    from orc_rust_spark.sources.orc_file import orc_to_table, write_orc

    vals = [-1, -999_999, -1_000_000, -1_500_000, -2_000_001, 0, 1]
    tbl = pa.table({"t": pa.array(vals, type=pa.int64())
                    .cast(pa.timestamp("us"))})
    ours, theirs = str(tmp_path / "ours.orc"), str(tmp_path / "lib.orc")
    write_orc(tbl, ours)
    paorc.write_table(tbl, theirs)
    for p in (ours, theirs):
        assert orc_to_table(p).column("t").cast(pa.int64()).to_pylist() \
            == vals, f"our reader on {p}"
        assert paorc.ORCFile(p).read().column("t").cast(
            pa.timestamp("us")).cast(pa.int64()).to_pylist() == vals, \
            f"liborc on {p}"
