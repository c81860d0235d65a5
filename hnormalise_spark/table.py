"""Snapshot-committed table layer: Iceberg when available, else
parquet + a JSON snapshot manifest.

The north rule / BASELINE.json ``input_hint`` name Iceberg tables with
snapshot-id checkpointing. This module provides that contract in two
tiers:

* **Real Iceberg** — if the iceberg-spark-runtime jar is on the
  classpath (``iceberg_available``), ``write_snapshot`` appends through
  the DataFrame v2 ``writeTo`` API and snapshot ids come from the
  table's own metadata. (The sandbox image has no Iceberg jar, so this
  branch is probed but cannot execute here; it is kept deliberately
  thin — one writeTo call — so there is nothing sandbox-specific to
  port.)
* **Manifest emulation** — parquet data files under
  ``<table>/data/snapshot_id=<id>/`` plus an append-only JSON manifest
  at ``<table>/_manifest/manifest.json`` recording committed snapshot
  ids. The manifest write is atomic (temp file + ``os.replace``), and
  a data write that crashed before its manifest commit is invisible to
  readers — the same commit-then-visible semantics an Iceberg snapshot
  gives, which is exactly what resume needs.

Resume contract (used by ``sinks.run_batch`` via ``snapshot_id``): a
snapshot id present in the manifest is *committed* — re-running it is
a no-op; an id absent from the manifest re-runs from scratch,
overwriting any partial orphan data dir (idempotent).
"""

from __future__ import annotations

import json
import os
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


# ---------------------------------------------------------------------------
# manifest emulation


def manifest_root(table_path: str) -> str:
    """ONE canonical manifest location per table, shared by the commit
    and the resume check. Filesystem tables keep the manifest inside
    the table dir; catalog identifiers (``cat.db.tbl`` — no ``/``) map
    to a sidecar dir since the identifier is not a path. Deriving this
    in exactly one place is load-bearing: round 2 computed it ad hoc on
    the commit side only, so ``is_committed`` never saw Iceberg commits
    and every resume would have re-appended the snapshot."""
    return table_path if "/" in table_path else table_path.replace(".", "_")


def _manifest_path(table_path: str) -> str:
    return os.path.join(manifest_root(table_path), "_manifest", "manifest.json")


def read_manifest(table_path: str) -> dict:
    p = _manifest_path(table_path)
    if not os.path.exists(p):
        return {"snapshots": []}
    with open(p) as fh:
        return json.load(fh)


def committed_snapshot_ids(table_path: str) -> list[str]:
    return [s["snapshot_id"] for s in read_manifest(table_path)["snapshots"]]


def _locked_manifest_swap(table_path: str, mutate, lock_timeout: float = 10.0) -> bool:
    """Run ``mutate(manifest_dict) -> bool`` under the table's manifest
    lock and atomically swap the result in. Two layers:

    * temp file + ``os.replace`` — readers never see a torn manifest;
    * an ``O_EXCL`` lock file serialising the read-modify-write, so two
      concurrent committers cannot lose an entry. This is the local-fs
      stand-in for what a real deployment delegates to the catalog
      (Iceberg's metastore/REST commit is the same single-writer swap);
      O_EXCL is not atomic on some object stores — there, the catalog
      IS the lock.

    ``mutate`` returning False aborts WITHOUT writing (optimistic
    validation failed — e.g. a compaction found its input set changed);
    the return value is passed through.
    """
    d = os.path.dirname(_manifest_path(table_path))
    os.makedirs(d, exist_ok=True)
    lock = os.path.join(d, ".manifest.lock")
    deadline = time.monotonic() + lock_timeout
    while True:
        try:
            lock_fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            break
        except FileExistsError:
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"manifest lock {lock} held past {lock_timeout}s — "
                    "crashed committer? remove the lock file to recover"
                )
            time.sleep(0.02)
    try:
        man = read_manifest(table_path)
        if not mutate(man):
            return False
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        with os.fdopen(fd, "w") as fh:
            json.dump(man, fh, indent=1)
        os.replace(tmp, _manifest_path(table_path))
        return True
    finally:
        os.close(lock_fd)
        os.unlink(lock)


def _commit_manifest(table_path: str, entry: dict, lock_timeout: float = 10.0) -> None:
    """Atomically append one snapshot entry (idempotent per id)."""

    def mutate(man: dict) -> bool:
        man["snapshots"] = [
            s for s in man["snapshots"] if s["snapshot_id"] != entry["snapshot_id"]
        ] + [entry]
        return True

    _locked_manifest_swap(table_path, mutate, lock_timeout)


def snapshot_data_path(table_path: str, snapshot_id: str) -> str:
    return os.path.join(table_path, "data", f"snapshot_id={snapshot_id}")


def is_committed(table_path: str, snapshot_id: str) -> bool:
    return snapshot_id in committed_snapshot_ids(table_path)


def write_snapshot(
    df: DataFrame,
    table_path: str,
    snapshot_id: str,
    partition_by: tuple[str, ...] = (),
    extra: dict | None = None,
) -> bool:
    """Write ``df`` as one committed snapshot. Returns False (no work)
    if the snapshot is already committed — the resume path.

    Emulation tier: data lands in ``data/snapshot_id=<id>/`` (mode
    overwrite, so a previous *uncommitted* partial attempt is simply
    replaced), then the manifest commit makes it visible.
    """
    if is_committed(table_path, snapshot_id):
        return False
    spark = df.sparkSession
    if iceberg_available(spark) and "/" not in table_path:
        # Real Iceberg (table_path is a catalog identifier here): one
        # atomic append per snapshot; Iceberg assigns its own snapshot
        # id, and our manifest still carries the *logical* id so resume
        # logic is engine-independent. The manifest commit goes through
        # the SAME canonical location `is_committed` reads
        # (manifest_root) — a path computed only on the commit side
        # made resume a silent double-append in round 2.
        from pyspark.errors import AnalysisException

        try:
            df.writeTo(table_path).append()
        except AnalysisException as e:
            # Only table-not-exists falls through to create; any other
            # append failure (auth, network, schema drift) must surface
            # — retrying it as a CREATE would at best fail confusingly
            # and at worst shadow real data loss.
            if "TABLE_OR_VIEW_NOT_FOUND" not in str(e):
                raise
            df.writeTo(table_path).using("iceberg").create()
        _commit_manifest(
            table_path,
            {"snapshot_id": snapshot_id, "engine": "iceberg", **(extra or {})},
        )
        return True
    _write_data_files(df, table_path, snapshot_id, partition_by)
    _commit_manifest(
        table_path,
        {"snapshot_id": snapshot_id, "engine": "parquet-manifest", **(extra or {})},
    )
    return True


def _write_data_files(
    df: DataFrame,
    table_path: str,
    snapshot_id: str,
    partition_by: tuple[str, ...] = (),
) -> None:
    """Write the snapshot's parquet dir WITHOUT committing it — the
    data stays invisible until a manifest swap names it. Split out so
    ``compact`` can stage its output first and commit atomically."""
    w = df.write.mode("overwrite")
    if partition_by:
        # align writers with partitions: without the shuffle every task
        # writes a sliver of every partition value (tasks x values tiny
        # files — the small-files failure mode at scale)
        df = df.repartition(*[F.col(c) for c in partition_by])
        w = df.write.mode("overwrite")
        w = w.partitionBy(*partition_by)
    w.parquet(snapshot_data_path(table_path, snapshot_id))


def live_snapshots(table_path: str) -> list[dict]:
    """Committed snapshots that have not been superseded by a
    compaction, in commit order (= version order)."""
    return [
        s
        for s in read_manifest(table_path)["snapshots"]
        if not s.get("superseded_by")
    ]


def read_committed(
    spark: SparkSession,
    table_path: str,
    snapshot_ids: list[str] | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Union of all live committed snapshots (uncommitted orphan dirs
    and compaction-superseded snapshots are NOT read —
    commit-then-visible). The ``snapshot_id`` partition column is kept
    on the rows (basePath read), so per-snapshot lineage survives.
    ``snapshot_ids`` pins an explicit set instead of re-reading the
    manifest (compaction's validated input set).

    ``merge_schema=True`` reconciles evolved schemas across snapshots
    (Iceberg-style add-column evolution: a later snapshot may carry new
    columns; earlier rows read them as null). Costs one footer read per
    file — metadata-only, unaffected by data volume — so it is safe at
    100 TB, but off by default since same-schema tables skip it."""
    ids = snapshot_ids
    if ids is None:
        ids = [s["snapshot_id"] for s in live_snapshots(table_path)]
    if not ids:
        raise FileNotFoundError(f"no committed snapshots in {table_path}")
    paths = [snapshot_data_path(table_path, s) for s in ids]
    reader = spark.read.option("basePath", os.path.join(table_path, "data"))
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*paths)


def read_snapshot(spark: SparkSession, table_path: str, snapshot_id: str) -> DataFrame:
    """Time-travel read of one committed snapshot (Iceberg's
    ``VERSION AS OF`` equivalent)."""
    if not is_committed(table_path, snapshot_id):
        raise FileNotFoundError(f"snapshot {snapshot_id} not committed in {table_path}")
    return spark.read.parquet(snapshot_data_path(table_path, snapshot_id))


# ---------------------------------------------------------------------------
# MERGE (upsert) = append snapshots + merge-on-read + compaction
#
# The Iceberg pattern: an upsert is just another committed snapshot
# (write_snapshot), the LATEST version per key is resolved at read
# time from the snapshot order (merge-on-read), and a compaction
# materializes that resolution into one snapshot and retires the
# inputs. Keys must be unique within one snapshot (each snapshot is
# one batch's output); across snapshots, later commits win.


def read_latest(
    spark: SparkSession,
    table_path: str,
    key_col: str,
    snaps: list[dict] | None = None,
) -> DataFrame:
    """Merge-on-read: one row per key — the version from the latest
    live snapshot that contains the key. Plan shape: the tiny
    (snapshot_id -> commit sequence) map joins broadcast; the
    per-key resolution is ONE window (max_by) over the key shuffle —
    no per-snapshot scans, no iterative joins.

    ``snaps`` pins the exact snapshot set to resolve over (compaction
    passes the set it validated against) instead of re-reading the
    manifest — two manifest reads could straddle a concurrent commit."""
    from pyspark.sql import Window

    if snaps is None:
        snaps = live_snapshots(table_path)
    seq = spark.createDataFrame(
        [(s["snapshot_id"], i) for i, s in enumerate(snaps)],
        "snapshot_id string, _seq long",
    )
    df = read_committed(
        spark, table_path, [s["snapshot_id"] for s in snaps]
    ).join(F.broadcast(seq), "snapshot_id")
    w = Window.partitionBy(key_col).orderBy(F.col("_seq").desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_seq", "snapshot_id")
    )


def compact(
    spark: SparkSession,
    table_path: str,
    snapshot_id: str,
    key_col: str,
    max_attempts: int = 3,
) -> bool:
    """Materialize the merge-on-read view as ONE new snapshot and
    retire (supersede) the inputs: the compaction entry AND the
    ``superseded_by`` stamps land in a SINGLE locked manifest swap, so
    a concurrent ``read_committed`` flips atomically from N-snapshot
    resolution to the compacted scan — it can never see inputs and
    compaction live together (duplicate rows).

    Concurrent appends are handled Iceberg-style (optimistic
    validation): the data files are staged uncommitted, and inside the
    lock the live snapshot set is re-checked against the set the
    compaction actually read. A snapshot committed in between would
    get a LOWER merge-on-read sequence than the compaction (silently
    losing its updates), so the commit aborts and the whole
    read→stage→validate cycle retries over the new set.

    Returns False if ``snapshot_id`` is already committed (resume
    no-op). Time-travel reads of superseded snapshots keep working —
    their data dirs are never deleted here (a real deployment
    garbage-collects them after a retention window)."""
    for _ in range(max_attempts):
        if is_committed(table_path, snapshot_id):
            return False
        snaps = live_snapshots(table_path)
        inputs = [s["snapshot_id"] for s in snaps]
        latest = read_latest(spark, table_path, key_col, snaps=snaps)
        _write_data_files(latest, table_path, snapshot_id)

        def mutate(man: dict) -> bool:
            live_now = [
                s["snapshot_id"]
                for s in man["snapshots"]
                if not s.get("superseded_by")
            ]
            if live_now != inputs:
                return False  # concurrent commit — abort, retry outside
            man["snapshots"].append(
                {
                    "snapshot_id": snapshot_id,
                    "engine": "parquet-manifest",
                    "compaction_of": inputs,
                }
            )
            for s in man["snapshots"]:
                if s["snapshot_id"] in inputs:
                    s["superseded_by"] = snapshot_id
            return True

        if _locked_manifest_swap(table_path, mutate):
            return True
    raise RuntimeError(
        f"compaction {snapshot_id} on {table_path} aborted {max_attempts} "
        "times: the live snapshot set kept changing under it"
    )


# ---------------------------------------------------------------------------
# bucketed layout — the co-located-join table format


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    keys: tuple[str, ...],
    buckets: int = 32,
    sort: bool = True,
) -> str:
    """Persist ``df`` as a hash-bucketed (and per-bucket sorted)
    parquet table registered in the session catalog.

    This is the 100-TB co-located-join layout: two tables bucketed on
    the same keys with the same bucket count join with ZERO Exchange —
    each task reads bucket i of both sides — and with ``sort=True`` the
    sort-merge join also skips its per-task Sort. Pay the shuffle once
    at write time, reuse it across every downstream join/aggregate on
    those keys (fact/dim co-location, incremental dedup against a
    persisted index, posting-list probes). Bucket pruning applies to
    equality predicates on the bucket keys.

    Returns the catalog table name (query with ``spark.table(name)``).
    An external table: data lives at ``path``, the catalog entry only
    records layout metadata, exactly how a warehouse would share the
    layout across jobs.
    """
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(buckets, *keys)
    )
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(name)
    return name


def snapshot_doc_diff(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Doc-level diff between two corpus versions (crawl N vs crawl
    N+1, or raw vs curated): one row per doc_id seen in either side
    with status ``added`` (only in B), ``removed`` (only in A),
    ``changed`` (both sides, content fingerprint differs), or
    ``unchanged``. Content identity is the repo-wide exact-dedup
    fingerprint — md5 of lower/trim/space-collapsed text — compared
    NULL-SAFELY, so two null-text versions of a doc are unchanged,
    not changed. The aggregate-level companion is
    ``textops.card_diff`` (what moved); this is the row-level "which
    docs moved" a release gate drills into.

    Scale shape: ONE full-outer sort-merge join keyed on the doc id —
    each side reduced to (id, 16-byte fingerprint) BEFORE the
    shuffle, so the wire carries ~24 bytes/doc, never text. When both
    versions are written with ``write_bucketed`` on the id, the join
    is co-located and the shuffle disappears entirely — the intended
    layout for repeated crawl-over-crawl diffs at 100 TB.
    """
    from hnormalise_spark.ops.dedup import normalized_text

    fa = a.select(
        F.col(id_col).alias("_id"),
        F.md5(normalized_text(F.col(text_col))).alias("_fp_a"),
        F.lit(1).alias("_in_a"),
    )
    fb = b.select(
        F.col(id_col).alias("_id"),
        F.md5(normalized_text(F.col(text_col))).alias("_fp_b"),
        F.lit(1).alias("_in_b"),
    )
    status = (
        F.when(F.col("_in_b").isNull(), F.lit("removed"))
        .when(F.col("_in_a").isNull(), F.lit("added"))
        .when(F.col("_fp_a").eqNullSafe(F.col("_fp_b")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (
        fa.join(fb, "_id", "full_outer")
        .select(F.col("_id").alias(id_col), status.alias("status"))
    )
