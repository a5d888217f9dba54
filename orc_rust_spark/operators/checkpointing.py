"""Lineage-truncating materialization with a durability escape hatch.

The iterative/broadcast-heavy operators (cosine_topk, embedding_neardup,
neardup_components) must materialize intermediate frames eagerly —
either to let corpus broadcasts be destroyed immediately, or to stop
iterative plans nesting one join tree per round (analyzer heap OOM at
~11 rounds, measured r6). ``localCheckpoint(eager=True)`` does that at
executor-storage cost but the truncated lineage is NON-recoverable: on a
real cluster, losing an executor that held checkpoint blocks fails every
downstream action permanently (driver-advice r5; documented in
cosine_topk's docstring).

``eager_checkpoint`` resolves the trade per-session instead of
hard-coding it (VERDICT r6 next #8): when the user configured a reliable
checkpoint directory (``spark.sparkContext.setCheckpointDir(...)`` —
typically an HDFS/object-store path on a cluster), frames checkpoint
RELIABLY there and survive executor loss; otherwise the historical
localCheckpoint fast path is used, byte-identical behavior to before.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def has_reliable_checkpoint_dir(df: DataFrame) -> bool:
    sc = df.sparkSession.sparkContext
    try:
        return sc.getCheckpointDir() is not None
    except Exception:  # very old API shapes: fall back to local
        return False


def eager_checkpoint(df: DataFrame) -> DataFrame:
    """Materialize ``df`` now and truncate its lineage.

    Reliable ``checkpoint(eager=True)`` when the session has a checkpoint
    dir configured (survives executor loss — cheap insurance on real
    clusters, at the cost of a write to the checkpoint filesystem), else
    ``localCheckpoint(eager=True)`` (executor-storage-backed, faster, the
    local-mode/bench default).

    Storage lifecycle: iterative operators release SUPERSEDED frames
    each round via :func:`release_checkpoint` (blocks freed locally,
    rdd-checkpoint dirs deleted reliably). Frames that remain the
    caller's result lineage (e.g. cosine_topk's candidate stage) cannot
    be released by the operator — in reliable mode their checkpoint
    dirs live until Spark's ContextCleaner removes them (set
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true``) or the
    application's checkpoint dir is cleaned up."""
    if has_reliable_checkpoint_dir(df):
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def release_checkpoint(df: DataFrame) -> None:
    """Best-effort release of an :func:`eager_checkpoint` frame's storage.
    ONLY call on frames no live DataFrame still depends on lazily — the
    stored data IS the truncated lineage.

    Local mode: unpersists the materialized RDD's blocks through the
    analyzed ``LogicalRDD`` (``Dataset.unpersist`` is a no-op there —
    checkpoint RDDs are cached directly, never registered with the
    CacheManager; verified on pyspark 4.1.2: storage drops to zero).

    Reliable mode (code-review r7): local unpersist frees nothing — the
    data lives as an rdd-checkpoint directory in the checkpoint
    filesystem, which Spark only deletes under
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (default
    false) and only on GC. Long label-propagation runs would otherwise
    leak one frame per round to the checkpoint filesystem, so the
    directory named by ``getCheckpointFile`` is deleted through the
    JVM Hadoop FileSystem (works for hdfs:// and s3a:// checkpoint
    dirs alike). Falls back silently if the internals ever change."""
    try:
        rdd = df._jdf.queryExecution().analyzed().rdd()
        rdd.unpersist(False)
        cf = rdd.getCheckpointFile()
        if cf.isDefined():
            sc = df.sparkSession.sparkContext
            jpath = sc._jvm.org.apache.hadoop.fs.Path(cf.get())
            fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
            fs.delete(jpath, True)
    except Exception:
        pass
