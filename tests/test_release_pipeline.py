"""release_pipeline flagship: status classification on a crafted corpus."""

import pytest
from pyspark.sql import functions as F

from hnormalise_spark.ops.dedup import normalized_text
from hnormalise_spark.ops.textops import blocklist_hits
from hnormalise_spark.table import snapshot_doc_diff


def _release(docs, terms, cap):
    # mirror of q_release_pipeline's composition (library surface)
    kept = docs.filter(F.size(blocklist_hits(terms)) == 0)
    keepers = kept.groupBy(
        F.md5(normalized_text(F.col("text"))).alias("_fp")
    ).agg(F.min("doc_id").alias("doc_id"))
    curated = kept.join(keepers.select("doc_id"), "doc_id").select(
        "doc_id",
        F.when(F.length("text") > cap, F.substring("text", 1, cap))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return snapshot_doc_diff(docs.select("doc_id", "text"), curated)


def test_status_classes(spark):
    rows = [
        (1, "clean and short"),                 # unchanged
        (2, "contains banned word"),            # removed (blocklist)
        (3, "same same"),                       # keeper of the dup pair
        (4, "same same"),                       # removed (dup non-keeper)
        (5, "x" * 50),                          # changed (truncated, cap 20)
        (6, None),                              # null text: kept, unchanged
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.status
        for r in _release(docs, ["banned"], cap=20).collect()
    }
    assert got == {
        1: "unchanged",
        2: "removed",
        3: "unchanged",
        4: "removed",
        5: "changed",
        6: "unchanged",
    }
