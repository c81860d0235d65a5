"""Token-table operators: exact/near dedup directly on
(doc_id, tokens:array<int>) and DSIR hashed-feature importance
scoring — pure-Python replicas, degenerate inputs, plan shapes."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from hnormalise_spark.ops import tokenops as TK

D = 256  # small bucket count so collisions actually occur in-test


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, tokens array<int>")


# ---------------------------------------------------------------------------
# exact dedup


def test_token_exact_dedup(spark):
    rows = [
        (1, [5, 6, 7]),
        (2, [5, 6, 7]),        # dup of 1
        (3, [5, 6, 70]),       # NOT a dup: "5,6,70" != "5,6,7"
        (4, [56, 7]),          # NOT a dup: "56,7" != "5,6,7"
        (5, []),
        (6, []),               # dup of 5 (both empty)
    ]
    out = {
        r["doc_id"]: (r["group_size"], r["keeper_id"], r["is_dup"])
        for r in TK.token_exact_dedup(_df(spark, rows)).collect()
    }
    assert out[1] == (2, 1, False)
    assert out[2] == (2, 1, True)
    assert out[3] == (1, 3, False)
    assert out[4] == (1, 4, False)
    assert out[5] == (2, 5, False)
    assert out[6] == (2, 5, True)


def test_token_exact_dedup_single_shuffle(spark):
    plan = (
        TK.token_exact_dedup(_df(spark, [(1, [1, 2])]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "Python" not in plan


# ---------------------------------------------------------------------------
# near dedup


def test_token_minhash_finds_near_dups(spark):
    seq = list(range(100, 180))
    near = seq[:40] + [999] + seq[41:]       # one token swapped
    far = list(range(5000, 5080))
    pairs = {
        (r["id_a"], r["id_b"])
        for r in TK.token_minhash_dedup(
            _df(spark, [(1, seq), (2, near), (3, far)]), threshold=0.5
        ).collect()
    }
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_token_minhash_drops_empty(spark):
    out = TK.token_minhash_dedup(
        _df(spark, [(1, []), (2, None), (3, [1, 2, 3])])
    ).collect()
    assert out == []


def test_token_minhash_arrow_equals_expression_path(spark):
    seq = list(range(300, 360))
    rows = [
        (1, seq),
        (2, seq[:30] + [7] + seq[31:]),
        (3, [9, 9, 9]),          # shorter than n: whole-sequence shingle
        (4, None),
        (5, []),
        (6, list(range(800, 860))),
        (7, [None] * 3),         # all-null elements: dropped by both paths
        (8, seq[:20] + [None] + seq[20:]),  # null element skipped, windows align
    ]
    df = _df(spark, rows)

    def pairs(use_arrow):
        return sorted(
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in TK.token_minhash_dedup(
                df, threshold=0.3, use_arrow=use_arrow
            ).collect()
        )

    assert pairs(True) == pairs(False)


# ---------------------------------------------------------------------------
# DSIR


def _feats(toks):
    unis = [str(t) for t in toks]
    bis = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return unis + bis


def _bucket(f, d=D, seed="dsf"):
    return int(hashlib.md5(f"{seed}|{f}".encode()).hexdigest()[:15], 16) % d


def _py_dsir(docs, target_ids, d=D):
    raw, tgt = {}, {}
    for i, toks in docs.items():
        for f in _feats(toks):
            b = _bucket(f, d)
            raw[b] = raw.get(b, 0) + 1
            if i in target_ids:
                tgt[b] = tgt.get(b, 0) + 1
    R, T = sum(raw.values()), sum(tgt.values())
    w = {
        b: math.floor(
            (math.log((tgt.get(b, 0) + 1) / (T + d))
             - math.log((cr + 1) / (R + d))) * 1e6 + 0.5
        )
        for b, cr in raw.items()
    }
    return {
        i: (len(_feats(toks)), sum(w[_bucket(f, d)] for f in _feats(toks)))
        for i, toks in docs.items()
        if toks
    }


def test_dsir_matches_python_replica(spark):
    docs = {
        1: [10, 11, 12, 10, 11],
        2: [10, 11, 12],
        3: [90, 91, 92, 93],
        4: [10, 90, 11, 91],
        5: [7],
        6: [],
    }
    target_ids = {1, 2}
    df = _df(spark, list(docs.items()))
    tgt = df.filter(F.col("doc_id").isin(list(target_ids)))
    got = {
        r["doc_id"]: (r["n_feat"], r["dsir_x1e6"])
        for r in TK.dsir_score(df, tgt, n_buckets=D).collect()
    }
    assert got == _py_dsir(docs, target_ids)


def test_dsir_target_like_docs_score_higher(spark):
    # doc 3 shares no features with the target; docs 1-2 ARE the target
    docs = {1: [10, 11, 12], 2: [10, 11, 13], 3: [90, 91, 92]}
    df = _df(spark, list(docs.items()))
    tgt = df.filter(F.col("doc_id") < 3)
    got = {r["doc_id"]: r["dsir_x1e6"] for r in TK.dsir_score(df, tgt, n_buckets=D).collect()}
    assert got[1] > got[3] and got[2] > got[3]


def test_dsir_plan_broadcasts_weights(spark):
    df = _df(spark, [(1, [1, 2, 3]), (2, [4, 5])])
    plan = (
        TK.dsir_score(df, df, n_buckets=D)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Python" not in plan


# ---------------------------------------------------------------------------
# repetition stats


def _rep_replica(tokens):
    """Pure-Python replica of token_repetition_stats for one row."""
    def dup_ppm(n):
        grams = [tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]
        if not grams:
            return None
        return math.floor((len(grams) - len(set(grams))) * 1e6 / len(grams) + 0.5)

    best = run = 0
    prev = object()
    for t in tokens:
        run = run + 1 if t == prev else 1
        best = max(best, run)
        prev = t
    return (len(tokens), dup_ppm(2), dup_ppm(3), best)


def test_token_repetition_matches_replica(spark):
    rows = [
        (1, [5, 5, 5, 5]),            # one run of 4, all bigrams equal
        (2, [1, 2, 1, 2, 1, 2]),      # alternating: dup bigrams, no runs
        (3, [1, 2, 3, 4, 5]),         # all distinct
        (4, [7]),                     # too short for any n-gram
        (5, []),                      # empty
        (6, [9, 9]),                  # exactly one bigram, no trigram
    ]
    out = {
        r["doc_id"]: (r["n_tok"], r["dup_bigram_ppm"], r["dup_trigram_ppm"], r["max_run"])
        for r in TK.token_repetition_stats(_df(spark, rows)).collect()
    }
    for doc_id, toks in rows:
        assert out[doc_id] == _rep_replica(toks), doc_id


def test_token_repetition_no_shuffle(spark):
    df = TK.token_repetition_stats(_df(spark, [(1, [1, 2, 3])]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# per-source KL drift


def test_source_token_kl_matches_replica(spark):
    rows = [
        (1, "a", [1, 1, 2]),
        (2, "a", [2, 3]),
        (3, "b", [3, 3, 3, 4]),
        (4, "b", []),          # contributes nothing
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, tokens array<int>")
    out = {r["source"]: (r["n_tok"], r["n_vocab_src"], r["kl_x1e6"])
           for r in TK.source_token_kl(df).collect()}

    # pure-Python replica with the same fixed operation order
    from collections import Counter
    st = Counter()
    for _, src, toks in rows:
        for t in toks:
            st[(src, t)] += 1
    n_s = Counter(); c_t = Counter()
    for (src, t), c in st.items():
        n_s[src] += c; c_t[t] += c
    n_total = sum(n_s.values())
    want = {}
    for src in n_s:
        pairs = [(t, c) for (s2, t), c in st.items() if s2 == src]
        kl = sum(math.floor((c / n_s[src])
                            * math.log((c * n_total) / (n_s[src] * c_t[t]))
                            * 1e6 + 0.5) for t, c in pairs)
        want[src] = (n_s[src], len(pairs), kl)
    assert out == want


def test_source_token_kl_identical_sources_have_zero_kl(spark):
    # every source emits the same distribution → p == q → ln(1) == 0
    rows = [(i, f"s{i % 3}", [1, 2, 2]) for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, source string, tokens array<int>")
    assert all(r["kl_x1e6"] == 0 for r in TK.source_token_kl(df).collect())


def test_source_token_kl_is_nonnegative_and_partition_invariant(spark):
    rows = [(i, f"s{i % 4}", [i % 7, (i * 3) % 5, 1]) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, source string, tokens array<int>")
    a = sorted(map(tuple, TK.source_token_kl(df).collect()))
    b = sorted(map(tuple, TK.source_token_kl(df.repartition(7)).collect()))
    assert a == b
    # Gibbs: KL >= 0 (micro-nat rounding can touch 0 but never go below
    # by more than per-term rounding; on this data it stays >= 0)
    assert all(t[-1] >= 0 for t in a)


# ---------------------------------------------------------------------------
# vocab remap


def test_vocab_remap_dense_ids_and_unk(spark):
    rows = [
        (1, [7, 7, 7, 5, 5, 9]),   # corpus freq: 7->3, 5->3 (one more below)
        (2, [5, 42]),              # 42 outside top-2 vocab -> unk
        (3, []),                   # empty survives as empty
    ]
    df = _df(spark, rows)
    # freq tie 5==7==3 -> token-ASC tiebreak: 5 gets id 1, 7 gets id 2
    vocab = TK.vocab_top_tokens(df, top_v=2)
    out = {r["doc_id"]: (r["tokens"], r["n_tok"], r["n_unk"])
           for r in TK.vocab_remap(df, vocab).collect()}
    assert out[1] == ([2, 2, 2, 1, 1, 0], 6, 1)   # 9 -> unk, order kept
    assert out[2] == ([1, 0], 2, 1)
    assert out[3] == ([], 0, 0)


def test_vocab_remap_rank_tiebreak_token_asc(spark):
    # equal freq -> lower token id wins the lower rank
    df = _df(spark, [(1, [3, 8]), (2, [8, 3])])
    out = TK.vocab_remap(df, TK.vocab_top_tokens(df, top_v=2)).collect()
    m = {r["doc_id"]: r["tokens"] for r in out}
    assert m[1] == [1, 2] and m[2] == [2, 1]


def test_vocab_remap_plan_broadcasts_vocab(spark):
    df = _df(spark, [(1, [1, 2, 3])])
    vocab = spark.createDataFrame([(1, 10), (2, 5)], "token int, freq long")
    plan = TK.vocab_remap(df, vocab)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# bigram LM on token ids


def test_token_lm_bigram_matches_replica(spark):
    rows = [(1, [1, 2, 1, 2]), (2, [1, 1]), (3, [3]), (4, [])]
    out = {r["doc_id"]: (r["n_tok"], r["sum_nll_x1e6"], r["mean_nll_x1e6"])
           for r in TK.token_lm_bigram(_df(spark, rows)).collect()}
    assert 4 not in out  # empty sequence excluded

    # replica: add-one smoothed bigram model over the same corpus
    from collections import Counter
    seqs = {i: t for i, t in rows if t}
    uni = Counter(t for s in seqs.values() for t in s)
    big = Counter((s[j - 1], s[j]) for s in seqs.values() for j in range(1, len(s)))
    T, V = sum(uni.values()), len(uni)
    for i, s in seqs.items():
        nlls = []
        for j, w in enumerate(s):
            if j == 0:
                pr = (uni[w] + 1.0) / (T + V)
            else:
                pr = (big[(s[j - 1], w)] + 1.0) / (uni[s[j - 1]] + V)
            nlls.append(math.floor(-math.log(pr) * 1e6 + 0.5))
        assert out[i] == (len(s), sum(nlls), math.floor(sum(nlls) / len(s)))


def test_token_lm_bigram_repeated_pairs_score_lower(spark):
    # a sequence made of the corpus's dominant bigram must have lower
    # mean NLL than one of never-seen transitions
    rows = [(i, [7, 8] * 10) for i in range(5)] + [(99, [8, 7] * 10)]
    out = {r["doc_id"]: r["mean_nll_x1e6"]
           for r in TK.token_lm_bigram(_df(spark, rows)).collect()}
    assert out[0] < out[99]


# ---------------------------------------------------------------------------
# near-dup clusters on token ids


def test_token_cluster_transitivity(spark):
    from hnormalise_spark.ops.dedup import assign_clusters

    seq = list(range(100, 140))
    rows = [
        (1, seq),
        (2, seq + [1, 2]),       # near-dups 1 via shared 8-grams
        (3, seq + [1, 2, 3, 4]), # near-dups 2 (and 1) -> one component
        (9, list(range(500, 540))),  # unrelated singleton
    ]
    df = _df(spark, rows)
    pairs = TK.token_minhash_dedup(df, n=8, k=16, bands=4, threshold=0.3)
    out = {r["doc_id"]: (r["cluster_id"], r["is_canonical"])
           for r in assign_clusters(df.select("doc_id"), pairs).collect()}
    assert out[1] == (1, True) and out[2] == (1, False) and out[3] == (1, False)
    assert out[9] == (9, True)
