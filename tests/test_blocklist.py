"""Blocklist filtering: pure-Python cross-check, path parity, totality."""

import pytest

from hnormalise_spark.ops.textops import blocklist_filter


DOCS = [
    (0, "the dup dup table has a dup row"),
    (1, "clean doc with no bad words"),
    (2, "slow query slow scan"),
    (3, ""),
    (4, None),
    (5, "dup and slow together"),
    (6, "dupes are not dup-matches unless exact dup"),
]
TERMS = ["slow", "dup", "junk", "dup"]  # unsorted + duplicate on purpose


def _py_blocklist(rows, terms):
    tset = set(terms)
    out = []
    for doc_id, text in rows:
        ws = [w for w in (text or "").split(" ") if w != ""]
        hits = [w for w in ws if w in tset]
        out.append(
            (
                doc_id,
                len(hits) == 0,
                len(hits),
                ",".join(sorted(set(hits))) if hits else None,
            )
        )
    return sorted(out)


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _collect(df):
    return sorted(
        (r.doc_id, r.keep, r.n_hits, r.hit_terms) for r in df.collect()
    )


def test_expression_path_matches_python(spark, docs_df):
    got = _collect(blocklist_filter(docs_df, TERMS))
    assert got == _py_blocklist(DOCS, TERMS)


def test_join_path_matches_expression_path(spark, docs_df):
    expr = _collect(blocklist_filter(docs_df, TERMS))
    join = _collect(blocklist_filter(docs_df, TERMS, join_threshold=0))
    assert join == expr


def test_totality_and_null_text(spark, docs_df):
    for thresh in (10_000, 0):
        rows = {r.doc_id: r for r in blocklist_filter(
            docs_df, TERMS, join_threshold=thresh).collect()}
        assert set(rows) == {d for d, _ in DOCS}
        for d in (3, 4):  # empty + null text are kept, clean
            assert rows[d].keep and rows[d].n_hits == 0
            assert rows[d].hit_terms is None


def test_counts_and_term_list(spark, docs_df):
    rows = {r.doc_id: r for r in blocklist_filter(docs_df, TERMS).collect()}
    assert rows[0].n_hits == 3 and rows[0].hit_terms == "dup"
    assert rows[5].n_hits == 2 and rows[5].hit_terms == "dup,slow"
    assert rows[6].n_hits == 1  # exact-word match only, not substring
    assert rows[1].keep and rows[2].n_hits == 2


def test_no_terms_keeps_everything(spark, docs_df):
    rows = blocklist_filter(docs_df, []).collect()
    assert all(r.keep and r.n_hits == 0 and r.hit_terms is None for r in rows)
