"""Context-window chunking, token-level decontamination, and
vocabulary/OOV coverage over the pre-tokenized table — pure-Python
replicas, edge cases (short/empty/null sequences, partial tails,
overlap math), and plan shapes (chunking must not shuffle; decontam
must broadcast the eval side)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hnormalise_spark.ops import tokenops as TK


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, tokens array<int>")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# token_chunks


def _py_chunks(seq, window, stride):
    seq = [t for t in seq if t is not None]
    if not seq:
        return []
    n = len(seq)
    k_max = 0 if n <= window else -(-(n - window) // stride)
    return [
        (i, seq[i * stride : i * stride + window])
        for i in range(k_max + 1)
    ]


def test_chunks_match_python_reference(spark):
    rows = [
        (1, list(range(10))),          # n < window → 1 partial chunk
        (2, list(range(16))),          # n == window → 1 full chunk
        (3, list(range(17))),          # 1 token over → 2 chunks
        (4, list(range(100))),         # many chunks, ragged tail
        (5, []),                       # no chunks
        (6, None),                     # no chunks
        (7, [1, None, 2, None, 3]),    # nulls dropped first
    ]
    out = TK.token_chunks(_df(spark, rows), window=16, stride=12).collect()
    got = {(r["doc_id"], r["chunk_idx"]): r["chunk_tokens"] for r in out}
    want = {}
    for doc_id, seq in rows:
        for i, chunk in _py_chunks(seq or [], 16, 12):
            want[(doc_id, i)] = chunk
    assert got == want
    # every chunk_len column agrees with the array it describes
    assert all(r["chunk_len"] == len(r["chunk_tokens"]) for r in out)


def test_chunks_cover_every_token_with_overlap(spark):
    seq = list(range(997))  # prime-ish length, guaranteed ragged tail
    out = TK.token_chunks(_df(spark, [(1, seq)]), window=64, stride=48).collect()
    covered = sorted({t for r in out for t in r["chunk_tokens"]})
    assert covered == seq
    # only the LAST chunk may be partial
    by_idx = sorted(out, key=lambda r: r["chunk_idx"])
    assert all(r["chunk_len"] == 64 for r in by_idx[:-1])
    assert 0 < by_idx[-1]["chunk_len"] <= 64


def test_chunks_drop_partial_and_nonoverlap_default(spark):
    df = _df(spark, [(1, list(range(70)))])
    # default stride == window → disjoint blocks
    full = TK.token_chunks(df, window=32).collect()
    assert sorted(r["chunk_len"] for r in full) == [6, 32, 32]
    kept = TK.token_chunks(df, window=32, drop_partial=True).collect()
    assert sorted(r["chunk_len"] for r in kept) == [32, 32]


def test_chunks_plan_has_no_shuffle_no_python(spark):
    plan = _plan(TK.token_chunks(_df(spark, [(1, [1, 2, 3])]), window=2))
    assert "Exchange" not in plan
    assert "Python" not in plan


# ---------------------------------------------------------------------------
# token_decontaminate


def test_token_decontaminate_flags_shared_ngrams(spark):
    corpus = _df(
        spark,
        [
            (1, list(range(20))),            # eval member: contaminated
            (2, list(range(5, 15))),         # inside 1's range: shares 8-grams
            (3, list(range(100, 120))),      # disjoint: clean
            (4, [1, 2, 3]),                  # too short for any 8-gram: clean
            (5, None),                       # null: clean, still present
        ],
    )
    ev = TK.token_eval_grams(corpus.filter(F.col("doc_id") == 1), n=8)
    out = {
        r["doc_id"]: (r["n_eval_hits"], r["contaminated"])
        for r in TK.token_decontaminate(corpus, ev, n=8).collect()
    }
    assert out[1] == (13, 1)     # 20 - 8 + 1 distinct 8-grams, all its own
    # doc 2 = positions 5..14 → 8-grams starting at 5,6,7 all inside doc 1
    assert out[2] == (3, 1)
    assert out[3] == (0, 0)
    assert out[4] == (0, 0)
    assert out[5] == (0, 0)
    assert len(out) == 5  # left join keeps every corpus row


def test_token_decontaminate_broadcasts_eval_side(spark):
    corpus = _df(spark, [(1, [1, 2, 3, 4, 5, 6, 7, 8, 9])])
    ev = TK.token_eval_grams(corpus, n=8)
    plan = _plan(TK.token_decontaminate(corpus, ev, n=8))
    assert plan.count("BroadcastHashJoin") == 2  # gram probe + hits attach
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# vocab / OOV


def test_vocab_top_tokens_deterministic_tiebreak(spark):
    # 1 and 2 tie on freq; token ASC must pick 1 first
    df = _df(spark, [(1, [1, 2, 1, 2, 3])])
    top = TK.vocab_top_tokens(df, top_v=2).collect()
    assert [(r["token"], r["freq"]) for r in top] == [(1, 2), (2, 2)]


def test_token_oov_stats(spark):
    df = _df(
        spark,
        [
            (1, [1, 1, 2, 9]),    # 1 of 4 OOV vs vocab {1,2}
            (2, [9, 9, 9]),       # all OOV
            (3, [1, 2]),          # none OOV
            (4, []),              # excluded
        ],
    )
    vocab = spark.createDataFrame([(1,), (2,)], "token int")
    out = {
        r["doc_id"]: (r["n_tok"], r["n_oov"], r["oov_ppm"])
        for r in TK.token_oov_stats(df, vocab).collect()
    }
    assert out[1] == (4, 1, 250000)
    assert out[2] == (3, 3, 1000000)
    assert out[3] == (2, 0, 0)
    assert 4 not in out


def test_token_oov_single_corpus_shuffle(spark):
    df = _df(spark, [(1, [1, 2, 3])])
    vocab = spark.createDataFrame([(1,), (2,)], "token int")
    plan = _plan(TK.token_oov_stats(df, vocab))
    # exactly one corpus-keyed Exchange (the repartition(_doc)); the
    # per-doc agg must reuse it rather than add a second doc shuffle.
    # The vocab side may carry its own tiny Exchanges (distinct +
    # broadcast) — those are bounded by the vocab, not the corpus.
    assert plan.count("hashpartitioning(_doc") == 1
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 1
