"""Stateful streaming exact-dedup: a continuously-crawled corpus keeps
only the FIRST occurrence of each document fingerprint across all
micro-batches — the streaming face of operators.dedup.exact_dedup.

Spark-first design: the stream is keyed by fingerprint (state is
hash-partitioned with the shuffle, so at 10^12-doc scale each task owns a
key range) and `applyInPandasWithState` holds one tiny state row per
fingerprint (first_seen flag + duplicate count). The built-in
`dropDuplicates` + watermark covers the bounded-lateness case; this
operator keeps state indefinitely (NoTimeout) and also counts the
duplicates it suppressed, which dropDuplicates cannot report.

State survives restarts through the streaming checkpoint — re-running a
drained availableNow query with the same checkpoint dir continues with
the fingerprints already seen (tested in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

_STATE_SCHEMA = T.StructType([
    T.StructField("emitted", T.BooleanType()),
    T.StructField("dup_count", T.LongType()),
])


def _dedup_group_fn(out_cols: list[str]):
    """Bind the output column order into the stateful group function
    (applyInPandasWithState passes no extra args)."""

    def _dedup_group(key, pdf_iter, state: GroupState):
        """One fingerprint's rows across this micro-batch. Emits the
        first-ever row for the key; every other row (this batch or any
        later one) is suppressed and counted."""
        emitted, dups = state.get if state.exists else (False, 0)
        first = None
        n = 0
        for pdf in pdf_iter:
            if first is None and len(pdf) and not emitted:
                first = pdf.iloc[[0]][out_cols]
            n += len(pdf)
        suppressed = n - (0 if emitted or first is None else 1)
        state.update((True, int(dups + suppressed)))
        if first is not None:
            yield first

    return _dedup_group


def streaming_exact_dedup(
    stream: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """documents stream -> first-occurrence-only stream.

    Mirrors the batch operator (operators.dedup.exact_dedup) exactly:
    null-text rows are filtered out up front (xxhash64/md5 of NULL would
    otherwise collapse every null-text document into one key and silently
    drop all but the first — code-review r6), and the fingerprint is the
    md5 prefix (as bigint) of whitespace-normalized LOWERCASE text — the
    same normalization as text_analysis.fingerprint_col, so batch and
    streaming produce the same keep-set on the same corpus.

    ``id_col`` must be a bigint column; output is
    (fingerprint, id_col, text_col).
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    fp = F.conv(F.substring(F.md5(norm), 1, 15), 16, 10).cast("long")
    out_schema = T.StructType([
        T.StructField("fingerprint", T.LongType()),
        T.StructField(id_col, T.LongType()),
        T.StructField(text_col, T.StringType()),
    ])
    keyed = (
        stream.where(F.col(text_col).isNotNull())
        .withColumn("fingerprint", fp)
    )
    return keyed.groupBy("fingerprint").applyInPandasWithState(
        _dedup_group_fn(["fingerprint", id_col, text_col]),
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SUMMARY_SCHEMA = T.StructType([
    T.StructField("fingerprint", T.LongType()),
    T.StructField("keeper_id", T.LongType()),
    T.StructField("dup_count", T.LongType()),
])


def _summary_group(key, pdf_iter, state: GroupState):
    """Per-fingerprint summary on first sight: keeper = min doc_id seen in
    the batch, dup_count = later occurrences. Deterministic whenever one
    micro-batch covers each key entirely (single-file backlog)."""
    seen_keeper, seen_dups, emitted = state.get if state.exists else (None, 0, False)
    keeper = seen_keeper
    n = 0
    for pdf in pdf_iter:
        if len(pdf):
            m = int(pdf["doc_id"].min())
            keeper = m if keeper is None else min(keeper, m)
            n += len(pdf)
    dups = seen_dups + n - (0 if emitted else 1)
    state.update((int(keeper), int(dups), True))
    if not emitted:
        import pandas as pd

        yield pd.DataFrame({
            "fingerprint": [key[0]], "keeper_id": [keeper], "dup_count": [dups],
        })


def streaming_dedup_summary(stream: DataFrame, text_col: str = "text") -> DataFrame:
    """documents stream -> one (fingerprint, keeper_id, dup_count) row per
    distinct text, via keyed state. The fingerprint is the md5-hex prefix
    as a bigint — recomputable by external SQL engines, so a drained
    static backlog has an exact value-level oracle (unlike xxhash64)."""
    fp = F.conv(F.substring(F.md5(F.col(text_col).cast("binary")), 1, 15), 16, 10)
    keyed = stream.withColumn("fingerprint", fp.cast("long"))
    return keyed.groupBy("fingerprint").applyInPandasWithState(
        _summary_group,
        outputStructType=SUMMARY_SCHEMA,
        stateStructType=T.StructType([
            T.StructField("keeper_id", T.LongType()),
            T.StructField("dup_count", T.LongType()),
            T.StructField("emitted", T.BooleanType()),
        ]),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_dedup_stream(
    spark, input_dir: str, output_dir: str, checkpoint_dir: str,
    schema="doc_id long, text string",
):
    """availableNow drain of the input backlog through the stateful dedup
    into an append parquet sink; returns the StreamingQuery."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    deduped = streaming_exact_dedup(stream)
    return (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
