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


def test_read_latest_broadcasts_seq_map(spark, tmp_path):
    tbl = str(tmp_path / "tbl2")
    T.write_snapshot(_df(spark, [(1, "a")]), tbl, "s1")
    T.write_snapshot(_df(spark, [(1, "b")]), tbl, "s2")
    plan = T.read_latest(spark, tbl, "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
