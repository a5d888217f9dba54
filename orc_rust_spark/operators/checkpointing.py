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
    local-mode/bench default)."""
    if has_reliable_checkpoint_dir(df):
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
