"""Streaming k-mins sketching over the snapshot table: per-batch
partial sketches append; read-time re-min equals the batch sketch of
everything streamed; replays are no-ops."""

from __future__ import annotations

import os

from hnormalise_spark import streaming, table as T
from hnormalise_spark.ops import sketches as SK

K = 64


def _rows(spark, lo, hi, slices=3):
    data = [("t%d" % (v % 3), v) for v in range(lo, hi)]
    return spark.createDataFrame(
        spark.sparkContext.parallelize(data, slices), "g string, v long"
    )


def test_stream_sketch_equals_batch_sketch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    sketch_path = str(tmp_path / "sketch")
    # several input files -> several micro-batches at max_files=1
    for lo, hi in [(0, 400), (300, 800), (750, 1200)]:
        _rows(spark, lo, hi).coalesce(1).write.mode("append").parquet(in_dir)

    q = streaming.streaming_kmin_sketch(
        spark, in_dir, sketch_path, group_col="g", value_col="v", k=K
    )
    q.awaitTermination()

    snaps = T.committed_snapshot_ids(sketch_path)
    assert len(snaps) >= 2, snaps  # genuinely incremental

    merged = {
        tuple(r)
        for r in streaming.read_kmin_sketch(spark, sketch_path).collect()
    }
    batch = {
        tuple(r)
        for r in SK.kmin_sketch(_rows(spark, 0, 1200), ["g"], "v", k=K).collect()
    }
    assert merged == batch


def test_replay_with_fresh_checkpoint_is_noop(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    sketch_path = str(tmp_path / "sketch")
    for j in range(2):
        _rows(spark, j * 100, (j + 1) * 100).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)

    def run():
        q = streaming.streaming_kmin_sketch(
            spark, in_dir, sketch_path, group_col="g", value_col="v", k=K
        )
        q.awaitTermination()

    run()
    before = {
        tuple(r)
        for r in streaming.read_kmin_sketch(spark, sketch_path).collect()
    }
    snaps_before = T.committed_snapshot_ids(sketch_path)
    # lose the checkpoint: every batch replays, write_snapshot no-ops
    import shutil

    shutil.rmtree(os.path.join(sketch_path, "_ck"))
    run()
    after = {
        tuple(r)
        for r in streaming.read_kmin_sketch(spark, sketch_path).collect()
    }
    assert after == before
    assert T.committed_snapshot_ids(sketch_path) == snaps_before


def test_estimate_from_streamed_sketch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    sketch_path = str(tmp_path / "sketch")
    _rows(spark, 0, 900).coalesce(1).write.parquet(in_dir)
    q = streaming.streaming_kmin_sketch(
        spark, in_dir, sketch_path, group_col="g", value_col="v", k=K
    )
    q.awaitTermination()
    est = {
        r["g"]: r["est_distinct_x1e3"] / 1000.0
        for r in SK.kmin_estimate(
            streaming.read_kmin_sketch(spark, sketch_path), ["g"], k=K
        ).collect()
    }
    # each of t0/t1/t2 holds 300 distinct values; 4-sigma at k=64
    for g in ("t0", "t1", "t2"):
        assert abs(est[g] - 300) <= 4 * (1 / 8) * 300, (g, est[g])
