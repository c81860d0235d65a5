"""MERGE (upsert) on the snapshot table layer: merge-on-read +
compaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from hnormalise_spark import table as T


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_upsert_merge_on_read_and_compaction(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    assert T.write_snapshot(_df(spark, [(1, "a1"), (2, "a2"), (3, "a3")]), tbl, "base")
    assert T.write_snapshot(_df(spark, [(2, "b2"), (3, "b3"), (4, "b4")]), tbl, "up1")

    # merge-on-read: later snapshot wins per key, unmatched keys survive
    latest = {r["doc_id"]: r["text"] for r in T.read_latest(spark, tbl, "doc_id").collect()}
    assert latest == {1: "a1", 2: "b2", 3: "b3", 4: "b4"}
    # raw committed union still holds every version (6 rows)
    assert T.read_committed(spark, tbl).count() == 6

    # compaction: one snapshot, same resolved rows, inputs retired
    assert T.compact(spark, tbl, "c1", "doc_id")
    assert [s["snapshot_id"] for s in T.live_snapshots(tbl)] == ["c1"]
    after = {r["doc_id"]: r["text"] for r in T.read_committed(spark, tbl).drop("snapshot_id").collect()}
    assert after == latest
    # resume no-op; time-travel to a superseded snapshot still works
    assert T.compact(spark, tbl, "c1", "doc_id") is False
    assert T.read_snapshot(spark, tbl, "base").count() == 3

    # upserts keep working on top of the compacted snapshot
    assert T.write_snapshot(_df(spark, [(1, "z1")]), tbl, "up2")
    latest2 = {r["doc_id"]: r["text"] for r in T.read_latest(spark, tbl, "doc_id").collect()}
    assert latest2 == {1: "z1", 2: "b2", 3: "b3", 4: "b4"}


def test_compact_is_one_manifest_swap_so_readers_flip_atomically(spark, tmp_path, monkeypatch):
    # the round-3 defect: compaction committed its snapshot in one swap
    # and stamped superseded_by in a SECOND — a reader between the two
    # saw inputs AND compaction live (duplicate rows). Proof of fix:
    # exactly one manifest transition happens during compact, and the
    # post-transition state already has the inputs retired.
    from hnormalise_spark import table as TT

    tbl = str(tmp_path / "t")
    T.write_snapshot(_df(spark, [(1, "a")]), tbl, "s1")
    T.write_snapshot(_df(spark, [(1, "b"), (2, "b2")]), tbl, "s2")

    states = []
    orig = TT._locked_manifest_swap

    def spy(table_path, mutate, lock_timeout=10.0):
        res = orig(table_path, mutate, lock_timeout)
        states.append(T.read_manifest(table_path))
        return res

    monkeypatch.setattr(TT, "_locked_manifest_swap", spy)
    assert T.compact(spark, tbl, "c", "doc_id")
    assert len(states) == 1  # ONE swap: no observable intermediate
    live = [s["snapshot_id"] for s in states[0]["snapshots"] if not s.get("superseded_by")]
    assert live == ["c"]
    # and a reader on the final state sees exactly the resolved rows
    rows = {r["doc_id"]: r["text"] for r in T.read_committed(spark, tbl).collect()}
    assert rows == {1: "b", 2: "b2"}


def test_compact_aborts_and_retries_on_concurrent_append(spark, tmp_path, monkeypatch):
    # a snapshot appended AFTER compact reads the live set would get a
    # LOWER merge-on-read sequence than the compaction — a silent lost
    # update. The optimistic validation must abort that commit and the
    # retry must fold the concurrent rows in.
    from hnormalise_spark import table as TT

    tbl = str(tmp_path / "t2")
    T.write_snapshot(_df(spark, [(1, "a"), (2, "a2")]), tbl, "s1")

    orig_write = TT._write_data_files
    fired = {"done": False}

    def sneaky(df, table_path, snapshot_id, partition_by=()):
        if snapshot_id == "c" and not fired["done"]:
            fired["done"] = True
            # concurrent writer lands an upsert between the live-set
            # read and the manifest commit
            T.write_snapshot(_df(spark, [(2, "NEW")]), tbl, "s2")
        orig_write(df, table_path, snapshot_id, partition_by)

    monkeypatch.setattr(TT, "_write_data_files", sneaky)
    assert T.compact(spark, tbl, "c", "doc_id")
    latest = {r["doc_id"]: r["text"] for r in T.read_latest(spark, tbl, "doc_id").collect()}
    assert latest == {1: "a", 2: "NEW"}  # the concurrent upsert survived
    assert [s["snapshot_id"] for s in T.live_snapshots(tbl)] == ["c"]


def test_read_latest_broadcasts_seq_map(spark, tmp_path):
    tbl = str(tmp_path / "tbl2")
    T.write_snapshot(_df(spark, [(1, "a")]), tbl, "s1")
    T.write_snapshot(_df(spark, [(1, "b")]), tbl, "s2")
    plan = T.read_latest(spark, tbl, "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_schema_evolution_merge_schema(spark, tmp_path):
    """Add-column evolution: a later snapshot carries a new column;
    merge_schema=True reads the union schema with nulls for old rows,
    and the default (off) still reads the original columns."""
    tbl = str(tmp_path / "evo")
    assert T.write_snapshot(_df(spark, [(1, "a"), (2, "b")]), tbl, "v1")
    evolved = spark.createDataFrame(
        [(3, "c", "en")], "doc_id long, text string, lang string"
    )
    assert T.write_snapshot(evolved, tbl, "v2")

    merged = T.read_committed(spark, tbl, merge_schema=True)
    assert set(merged.columns) == {"doc_id", "text", "lang", "snapshot_id"}
    langs = {r["doc_id"]: r["lang"] for r in merged.collect()}
    assert langs == {1: None, 2: None, 3: "en"}


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """write_bucketed: two tables bucketed on the same key join with
    ZERO Exchange — the pay-shuffle-once co-located layout."""
    facts = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    dims = spark.range(0, 100).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("d")
    )
    T.write_bucketed(facts, "bk_facts", str(tmp_path / "bf"), ("k",), buckets=4)
    T.write_bucketed(dims, "bk_dims", str(tmp_path / "bd"), ("k",), buckets=4)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bk_facts").join(spark.table("bk_dims"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert joined.count() == 100
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bk_facts")
        spark.sql("DROP TABLE IF EXISTS bk_dims")
