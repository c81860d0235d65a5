"""Connected-components clustering over near-dup pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from hnormalise_spark.ops import dedup as D


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_components_chain_and_islands(spark):
    # chain 1-2-3-4 (diameter > 1 forces >1 propagation round),
    # island {10, 11}, and 20-30 bridged through 25
    edges = _edges(
        spark,
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 25), (25, 30)],
    )
    got = {r["node"]: r["cluster_id"] for r in D.connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 25: 20, 30: 20}


def test_components_long_chain_converges(spark):
    # a 12-node path written worst-case (descending ids) needs many
    # min-propagation rounds — exercises the iteration + checkpoint loop
    edges = _edges(spark, [(i + 1, i) for i in range(11)])
    got = {r["node"]: r["cluster_id"] for r in D.connected_components(edges).collect()}
    assert got == {i: 0 for i in range(12)}


def test_assign_clusters_marks_canonicals_and_singletons(spark):
    corpus = spark.range(8).select(F.col("id").alias("doc_id"), (F.col("id") * 10).alias("payload"))
    edges = _edges(spark, [(1, 3), (3, 5), (2, 6)])
    out = D.assign_clusters(corpus, edges).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(out) == 8  # full-corpus assignment, no row lost
    for i, want in {0: 0, 1: 1, 2: 2, 3: 1, 4: 4, 5: 1, 6: 2, 7: 7}.items():
        assert by_id[i]["cluster_id"] == want
        assert by_id[i]["is_canonical"] == (i == want)
        assert by_id[i]["payload"] == i * 10  # original columns survive
    # filter(is_canonical) IS the deduped corpus
    kept = sorted(r["doc_id"] for r in out if r["is_canonical"])
    assert kept == [0, 1, 2, 4, 7]
