"""Streaming HLL snapshots: read-time re-max equals the batch sketch."""

from hnormalise_spark import streaming, table as T
from hnormalise_spark.ops import sketches as SK


def _rows(spark, lo, hi, slices=3):
    data = [("t%d" % (v % 3), v) for v in range(lo, hi)]
    return spark.createDataFrame(
        spark.sparkContext.parallelize(data, slices), "g string, v long"
    )


def test_stream_hll_equals_batch_hll(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    sketch_path = str(tmp_path / "hll")
    for lo, hi in [(0, 400), (300, 800), (750, 1200)]:
        _rows(spark, lo, hi).coalesce(1).write.mode("append").parquet(in_dir)

    q = streaming.streaming_hll_sketch(
        spark, in_dir, sketch_path, group_col="g", value_col="v", p=6
    )
    q.awaitTermination()

    assert len(T.committed_snapshot_ids(sketch_path)) >= 2

    merged = {
        tuple(r) for r in streaming.read_hll_sketch(spark, sketch_path).collect()
    }
    batch = {
        tuple(r)
        for r in SK.hll_sketch(_rows(spark, 0, 1200), ["g"], "v", p=6).collect()
    }
    assert merged == batch

    # and the estimate off the merged registers matches the batch one
    est_m = SK.hll_estimate(
        streaming.read_hll_sketch(spark, sketch_path), ["g"]
    ).collect()
    est_b = SK.hll_estimate(
        SK.hll_sketch(_rows(spark, 0, 1200), ["g"], "v"), ["g"]
    ).collect()
    key = lambda r: r.g  # noqa: E731
    assert sorted(est_m, key=key) == sorted(est_b, key=key)
