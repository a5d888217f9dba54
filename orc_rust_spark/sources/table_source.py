"""Input-table loading for the encode job: parquet directories and
Iceberg tables, each with a pinned, immutable snapshot identity.

The north-rule input is "Iceberg tables of Common-Crawl-style web
pages"; to Spark an Iceberg table is just another DSv2 source, so the
engine stays format-agnostic DataFrames and only THIS module knows how
to (a) open the table and (b) derive the snapshot id the resumable
manifest records (plans/pipeline.py lineage rows). Pinning matters:
resume skips partitions recorded "done" for a snapshot id, which is
only sound if the same id always denotes the same immutable bytes —
Iceberg gives that natively (snapshot-id time travel); for local
parquet directories we derive a content fingerprint from the recursive
file listing (relative path + size + mtime), which changes whenever any
input file changes. When no sound identity can be derived (remote URI,
unreadable metadata), load_source returns ``None`` and the caller falls
back to a fresh NON-resumable run id — never a shared constant that
would let two different table states resume each other (code-review r6).

The sandbox ships no iceberg-spark-runtime jar, so the Iceberg branch
is gated: availability is probed via the JVM classpath (both the system
and Spark's context classloader, where --packages jars land) and a
missing runtime raises one actionable error instead of Spark's deep
ClassNotFoundException. The branch logic itself (option wiring,
snapshot resolution order) is unit-tested without the jar.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession

#: the DSv2 class the iceberg-spark-runtime jar registers; probing for
#: it is how we distinguish "jar missing" from a genuine read error
_ICEBERG_SOURCE_CLASS = "org.apache.iceberg.spark.source.IcebergSource"


def iceberg_available(spark: SparkSession) -> bool | None:
    """True when the Iceberg Spark runtime is loadable, False when
    provably absent, None when undecidable (e.g. Spark Connect, where
    ``spark._jvm`` does not exist — the caller then just attempts the
    read). Probes BOTH the launch classpath and Spark's context
    classloader: jars delivered via ``--packages``/``spark.jars`` load
    into the latter only (code-review r6)."""
    try:
        jvm = spark._jvm
        if jvm is None:
            return None
    except Exception:
        return None
    try:
        jvm.java.lang.Class.forName(_ICEBERG_SOURCE_CLASS)
        return True
    except Exception:
        pass
    try:
        loader = jvm.org.apache.spark.util.Utils.getContextOrSparkClassLoader()
        jvm.java.lang.Class.forName(_ICEBERG_SOURCE_CLASS, False, loader)
        return True
    except Exception:
        return False


def parquet_fingerprint(input_dir: str) -> str | None:
    """Deterministic snapshot id for a LOCAL parquet directory: sha256
    over the sorted (relative path, size, mtime_ns) listing of every
    *.parquet file under it, recursively — Hive-partitioned layouts
    (``date=.../part-*.parquet``) fingerprint all nested files, so a
    rewritten nested file normally flips the id. Any added/removed/
    resized/re-dated file changes the id. Listing-only — no data is
    read, O(files) driver cost. Caveat: the id trusts (size, mtime_ns) —
    a rewrite that preserves BOTH (e.g. mtime pinned by ``touch -r`` or
    SOURCE_DATE_EPOCH archives) keeps the old id and could resume a
    stale manifest; pass an explicit ``snapshot_id`` for such inputs
    (code-review r6).

    Returns ``None`` for locations the local filesystem cannot list
    (``s3a://``/``hdfs://`` URIs, missing dirs): the caller then runs
    without a derived identity rather than crashing on inputs
    ``spark.read.parquet`` itself handles fine (code-review r6).
    Raises only for a listable directory containing no parquet files —
    that input would fail the read anyway, and louder."""
    if not os.path.isdir(input_dir):
        return None
    entries = []
    for root, _dirs, files in os.walk(input_dir):
        for name in files:
            if name.endswith(".parquet"):
                p = os.path.join(root, name)
                entries.append((os.path.relpath(p, input_dir), os.stat(p)))
    if not entries:
        raise FileNotFoundError(f"no parquet files under {input_dir}")
    h = hashlib.sha256()
    for rel, st in sorted(entries):
        h.update(f"{rel}\x00{st.st_size}\x00{st.st_mtime_ns}\n".encode())
    return "pq-" + h.hexdigest()[:24]


def _iceberg_current_snapshot(spark: SparkSession, table: str) -> str | None:
    """Current snapshot id of an Iceberg table. The ``.history``
    metadata table is consulted first — ``max(committed_at)`` over
    ``.snapshots`` is WRONG after a rollback, because rolled-back
    snapshots stay in ``.snapshots`` with later timestamps than the
    restored current one, while ``.history`` records what was made
    current when (code-review r6). Falls back to ``.snapshots`` for
    engines without ``.history``; ``None`` when neither is readable
    (the caller then runs unpinned and NON-resumable)."""
    try:
        row = spark.sql(
            f"SELECT snapshot_id FROM {table}.history "
            "WHERE is_current_ancestor ORDER BY made_current_at DESC LIMIT 1"
        ).collect()
        if row:
            return str(row[0][0])
    except Exception:
        pass
    try:
        row = spark.sql(
            f"SELECT snapshot_id FROM {table}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return str(row[0][0]) if row else None
    except Exception:
        return None


def _raise_iceberg_unavailable() -> None:
    raise RuntimeError(
        "input format 'iceberg' needs the iceberg-spark-runtime jar on "
        "the Spark classpath (spark-submit --packages "
        "org.apache.iceberg:iceberg-spark-runtime-3.5_2.13:<ver> plus a "
        "catalog in spark.sql.catalog.*); it is not present in this "
        "session"
    )


def load_source(
    spark: SparkSession,
    location: str,
    fmt: str = "parquet",
    snapshot_id: str | None = None,
) -> tuple[DataFrame, str | None]:
    """Open the encode-job input -> (DataFrame, effective snapshot id).

    The returned id is ``None`` whenever no SOUND immutable identity
    exists (remote parquet URI without a caller-supplied id; Iceberg
    snapshot resolution failed) — callers must then mint a fresh
    non-resumable run id, because resuming under a shared placeholder
    would silently mix two table states.

    fmt='parquet': ``location`` is a directory; the effective snapshot
    id is the caller's, else the recursive content fingerprint above —
    so a re-run over unchanged local inputs resumes automatically and a
    changed input re-encodes from scratch.

    fmt='iceberg': ``location`` is a catalog table name (e.g.
    ``my_catalog.db.webtext``). With ``snapshot_id`` the read is pinned
    via the DSv2 ``snapshot-id`` option (time travel — always the same
    bytes); without, the table's current snapshot id is resolved
    (rollback-aware, via ``.history``) and THEN pinned, so the manifest
    still records an immutable identity even if the table receives new
    commits mid-job. Requires the iceberg-spark-runtime jar + catalog
    config; a missing runtime raises one actionable RuntimeError.
    """
    if fmt == "parquet":
        # fingerprint FIRST: spark.read.parquet pins its file listing at
        # read time, so fingerprinting afterwards could record an id for
        # files the DataFrame never saw (a concurrent add between the
        # two) — the unsafe direction of the race, since a later re-run
        # over the stable directory would resume a manifest missing
        # those rows. Fingerprint-then-read fails SAFE: any concurrent
        # change makes the next run's id mismatch and forces a fresh
        # encode (code-review r6).
        sid = snapshot_id or parquet_fingerprint(location)
        return spark.read.parquet(location), sid
    if fmt == "iceberg":
        avail = iceberg_available(spark)
        if avail is False:
            _raise_iceberg_unavailable()
        sid = snapshot_id or _iceberg_current_snapshot(spark, location)
        reader = spark.read.format("iceberg")
        if sid is not None:
            reader = reader.option("snapshot-id", str(sid))
        try:
            df = reader.load(location)
        except Exception as ex:  # pragma: no cover - needs the jar absent
            # an undecidable probe (Spark Connect) still deserves the
            # actionable message when the failure is the missing runtime
            msg = str(ex)
            if ("ClassNotFound" in msg or "Failed to find" in msg
                    or "DATA_SOURCE_NOT_FOUND" in msg):
                _raise_iceberg_unavailable()
            raise
        return df, (str(sid) if sid is not None else None)
    raise ValueError(f"unknown input format {fmt!r} (parquet|iceberg)")
