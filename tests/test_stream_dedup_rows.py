"""streaming_dedup_rows: single-batch determinism + cross-batch
suppression on planted duplicates."""

import os

import pytest
from pyspark.sql import functions as F

from hnormalise_spark.ops.dedup import normalized_text
from hnormalise_spark.streaming import streaming_dedup_rows


ROWS = [
    ("09", "alpha beta"),
    ("10", "alpha beta"),     # dup of 09; "09" < "10" as strings
    ("2", "ALPHA   beta "),   # dup after normalization; "10" < "2"
    ("3", "gamma"),
    ("4", "delta"),
    ("5", "gamma"),           # dup of 3
]


def _fingerprinted(spark, in_dir):
    return (
        spark.readStream.schema("doc_id string, raw string")
        .parquet(in_dir)
        .select(
            "doc_id",
            "raw",
            F.md5(normalized_text(F.col("raw"))).alias("fingerprint"),
        )
    )


def test_single_batch_keeps_string_min_and_counts(spark, tmp_path):
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    df = spark.createDataFrame(ROWS, "doc_id string, raw string")
    df.coalesce(1).write.parquet(in_dir)

    q = streaming_dedup_rows(_fingerprinted(spark, in_dir), out_dir)
    q.awaitTermination()

    got = {
        r.doc_id: (r.raw, r.n_batch_dups)
        for r in spark.read.parquet(os.path.join(out_dir, "deduped")).collect()
    }
    # "alpha beta" group: string-min of {"09","10","2"} is "09", 2 dups
    assert got == {
        "09": ("alpha beta", 2),
        "3": ("gamma", 1),
        "4": ("delta", 0),
    }


def test_cross_batch_suppression(spark, tmp_path):
    # one file per row + maxFilesPerTrigger=1 → one micro-batch per
    # row, so later occurrences are suppressed by STATE, not batching
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    os.makedirs(in_dir)
    for i, (doc_id, raw) in enumerate(ROWS):
        spark.createDataFrame(
            [(doc_id, raw)], "doc_id string, raw string"
        ).coalesce(1).write.parquet(os.path.join(in_dir, f"f{i}"))

    rows = (
        spark.readStream.schema("doc_id string, raw string")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir + "/*")
        .select(
            "doc_id",
            "raw",
            F.md5(normalized_text(F.col("raw"))).alias("fingerprint"),
        )
    )
    q = streaming_dedup_rows(rows, out_dir)
    q.awaitTermination()

    out = spark.read.parquet(os.path.join(out_dir, "deduped")).collect()
    # exactly one emission per fingerprint, n_batch_dups counts only
    # the FIRST batch's extra occurrences (0 here — one row per batch);
    # which variant's raw survives depends on file arrival order, so
    # pin the fingerprint set, not the raws
    import hashlib

    def fp(s):
        norm = " ".join(s.split()).strip().lower()
        return hashlib.md5(norm.encode()).hexdigest()

    assert sorted(r.fingerprint for r in out) == sorted(
        {fp(raw) for _, raw in ROWS}
    )
    assert all(r.n_batch_dups == 0 for r in out)
