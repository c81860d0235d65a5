"""Cross-document duplicated-span extraction/removal: pure-Python
replica agreement, maximal-interval merging, and edge cases."""

from __future__ import annotations

from hnormalise_spark.ops import textops as T

K = 3


def _df(spark, docs: dict[int, str], slices=3):
    return spark.createDataFrame(
        spark.sparkContext.parallelize(list(docs.items()), slices),
        "doc_id long, text string",
    )


def _py_spans(docs: dict[int, str], k=K):
    toks = {d: t.split() for d, t in docs.items()}
    gram_docs: dict[tuple, set] = {}
    for d, ts in toks.items():
        for p in range(len(ts) - k + 1):
            gram_docs.setdefault(tuple(ts[p : p + k]), set()).add(d)
    spans = {}
    for d, ts in toks.items():
        hits = [
            p
            for p in range(len(ts) - k + 1)
            if len(gram_docs[tuple(ts[p : p + k])]) >= 2
        ]
        out, cur = [], None
        for p in hits:
            if cur is None or p > cur[1]:
                if cur:
                    out.append(cur)
                cur = [p, p + k]
            else:
                cur[1] = max(cur[1], p + k)
        if cur:
            out.append(cur)
        spans[d] = [tuple(s) for s in out]
    return spans


def _py_clean(docs: dict[int, str], k=K):
    spans = _py_spans(docs, k)
    out = {}
    for d, t in docs.items():
        ts = t.split()
        covered = set()
        for a, b in spans[d]:
            covered.update(range(a, b))
        kept = [w for i, w in enumerate(ts) if i not in covered]
        out[d] = (" ".join(kept), len(ts), len(ts) - len(kept))
    return out


CORPUS = {
    1: "alpha beta gamma delta epsilon zeta eta theta",
    2: "xx yy alpha beta gamma delta epsilon qq rr ss",
    3: "completely different words with no shared runs at all",
    4: "pp alpha beta gamma qq delta epsilon zeta rr",
}


def test_spans_match_python_replica(spark):
    got = {}
    for r in T.duplicate_span_extract(_df(spark, CORPUS), k=K).collect():
        got.setdefault(r["doc_id"], []).append((r["span_start"], r["span_end"]))
    want = {d: s for d, s in _py_spans(CORPUS).items() if s}
    assert {d: sorted(v) for d, v in got.items()} == want


def test_overlapping_hits_merge_to_one_interval(spark):
    # doc 1 shares "alpha beta gamma delta epsilon" with doc 2 (hits
    # at 0,1,2) and "delta epsilon zeta" with doc 4 (hit at 3): four
    # overlapping hit windows merge into ONE maximal [0,6) span
    got = {
        (r["span_start"], r["span_end"])
        for r in T.duplicate_span_extract(_df(spark, CORPUS), k=K)
        .filter("doc_id = 1")
        .collect()
    }
    assert got == {(0, 6)}


def test_removal_matches_python_replica(spark):
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in T.remove_duplicate_spans(_df(spark, CORPUS), k=K).collect()
    }
    assert got == _py_clean(CORPUS)


def test_unique_doc_untouched(spark):
    got = {
        r["doc_id"]: r
        for r in T.remove_duplicate_spans(_df(spark, CORPUS), k=K).collect()
    }
    assert got[3]["n_removed"] == 0
    assert got[3]["clean_text"] == CORPUS[3]


def test_all_boilerplate_doc_comes_back_empty(spark):
    docs = {1: "same old text", 2: "same old text", 3: "unique stuff here now"}
    got = {
        r["doc_id"]: r
        for r in T.remove_duplicate_spans(_df(spark, docs), k=K).collect()
    }
    assert got[1]["clean_text"] == "" and got[1]["n_removed"] == 3
    assert got[2]["clean_text"] == ""
    assert got[3]["n_removed"] == 0


def test_short_docs_have_no_spans(spark):
    docs = {1: "one two", 2: "one two", 3: "longer doc with words"}
    assert T.duplicate_span_extract(_df(spark, docs), k=K).count() == 0
    got = {
        r["doc_id"]: r
        for r in T.remove_duplicate_spans(_df(spark, docs), k=K).collect()
    }
    assert got[1]["clean_text"] == "one two" and got[1]["n_removed"] == 0


def test_partition_invariance(spark):
    docs = {i: CORPUS[1 + (i % 4)] + f" tail{i % 2}" for i in range(1, 40)}
    one = {
        tuple(r)
        for r in T.duplicate_span_extract(_df(spark, docs, 1), k=K).collect()
    }
    many = {
        tuple(r)
        for r in T.duplicate_span_extract(_df(spark, docs, 9), k=K).collect()
    }
    assert one == many
