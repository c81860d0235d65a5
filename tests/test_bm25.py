"""BM25 top-k retrieval semantics."""

from __future__ import annotations

from hnormalise_spark.ops.textops import bm25_topk


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
