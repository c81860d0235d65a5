"""BM25 top-k retrieval semantics (inline and persisted-index paths)."""

from __future__ import annotations

from hnormalise_spark.ops.textops import (
    bm25_build_index,
    bm25_topk,
    bm25_topk_indexed,
    term_bucket_py,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_ranks_tf_and_rarity(spark):
    docs = _docs(
        spark,
        [
            (1, "cat cat cat dog"),      # high tf for 'cat'
            (2, "cat dog dog dog"),      # low tf for 'cat'
            (3, "dog dog dog dog"),      # no query term
            (4, "cat fish"),             # short doc, one 'cat'
        ],
    )
    got = bm25_topk(docs, ["cat"], k=10).collect()
    ids = [r["doc_id"] for r in got]
    # only matching docs appear, best-first
    assert set(ids) == {1, 2, 4}
    assert ids[0] == 1  # tf=3 beats tf=1
    # shorter doc 4 outranks longer doc 2 at equal tf (length norm)
    assert ids.index(4) < ids.index(2)
    assert all(r["score_x1e6"] > 0 for r in got)


def test_bm25_rare_term_outweighs_common(spark):
    # 'zebra' appears in 1/5 docs, 'cat' in 4/5 -> idf(zebra) >> idf(cat)
    docs = _docs(
        spark,
        [
            (1, "cat mouse"),
            (2, "cat bird"),
            (3, "cat fish"),
            (4, "cat frog"),
            (5, "zebra lion"),
        ],
    )
    got = {r["doc_id"]: r["score_x1e6"] for r in bm25_topk(docs, ["cat", "zebra"], k=10).collect()}
    assert got[5] > max(got[d] for d in (1, 2, 3, 4))


def test_bm25_k_limit_and_tiebreak(spark):
    docs = _docs(spark, [(i, "cat x") for i in range(10)])
    got = bm25_topk(docs, ["cat"], k=3).collect()
    # identical docs tie on score -> lowest doc_id wins, exactly k rows
    assert [r["doc_id"] for r in got] == [0, 1, 2]


_CORPUS = [
    (1, "cat cat cat dog mouse"),
    (2, "cat dog dog dog"),
    (3, "dog dog dog dog zebra"),
    (4, "cat fish"),
    (5, "zebra lion cat"),
    (6, "fish fish fish"),
]


def test_bm25_indexed_matches_inline(spark, tmp_path):
    docs = _docs(spark, _CORPUS)
    idx = str(tmp_path / "bm25idx")
    bm25_build_index(docs, idx, "base")
    for terms in (["cat"], ["cat", "zebra"], ["fish", "dog", "cat"]):
        inline = [(r["doc_id"], r["score_x1e6"]) for r in bm25_topk(docs, terms, k=10).collect()]
        indexed = [(r["doc_id"], r["score_x1e6"]) for r in bm25_topk_indexed(spark, idx, terms, k=10).collect()]
        assert indexed == inline, terms


def test_bm25_index_build_is_resumable_noop(spark, tmp_path):
    import os

    from hnormalise_spark import table as T

    docs = _docs(spark, _CORPUS)
    idx = str(tmp_path / "bm25idx2")
    bm25_build_index(docs, idx, "base")
    assert T.is_committed(idx, "base") and T.is_committed(idx + "_stats", "base")
    mtime = os.path.getmtime(T._manifest_path(idx))
    bm25_build_index(docs, idx, "base")  # committed id: no work
    assert os.path.getmtime(T._manifest_path(idx)) == mtime


def test_bm25_indexed_probe_is_partition_pruned(spark, tmp_path):
    docs = _docs(spark, _CORPUS)
    idx = str(tmp_path / "bm25idx3")
    bm25_build_index(docs, idx, "base")
    plan = (
        bm25_topk_indexed(spark, idx, ["cat", "zebra"], k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the bucket filter reaches the scan as a PartitionFilter: only the
    # query terms' buckets are opened
    want = sorted({term_bucket_py(t) for t in ("cat", "zebra")})
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*term_bucket[^\]]*)\]", plan)
    assert m, plan[:2000]
    assert all(str(b) in m.group(1) for b in want)
