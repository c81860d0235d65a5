"""Round-4b text operators: unigram LM scoring, repetition filters,
cross-doc duplicated spans, iterative BPE training — semantics against
hand-computed / pure-Python references plus the plan shapes (single
Exchange in repetition_stats, broadcast vocab join in lm_unigram_score).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# unigram LM scoring


def test_lm_unigram_score_matches_hand_computation(spark):
    from hnormalise_spark.ops.textops import lm_unigram_score

    docs = _docs(spark, [(1, "a a b"), (2, "b c"), (3, None), (4, "  ")])
    out = {r["doc_id"]: r for r in lm_unigram_score(docs).collect()}
    # corpus counts: a=2, b=2, c=1 -> T=5, V=3
    def nll(c):
        return math.floor(-math.log((c + 1) / (5 + 3)) * 1e6 + 0.5)

    assert set(out) == {1, 2}  # null/blank docs excluded
    assert out[1]["n_tok"] == 3
    assert out[1]["sum_nll_x1e6"] == 2 * nll(2) + nll(2)
    assert out[1]["mean_nll_x1e6"] == out[1]["sum_nll_x1e6"] // 3
    assert out[2]["sum_nll_x1e6"] == nll(2) + nll(1)
    # rarer tokens score higher NLL
    assert out[2]["sum_nll_x1e6"] > out[1]["sum_nll_x1e6"] * 2 // 3


def test_lm_unigram_score_vocab_join_is_broadcast(spark):
    from hnormalise_spark.ops.textops import lm_unigram_score

    docs = _docs(spark, [(1, "a b"), (2, "b c")])
    plan = _plan(lm_unigram_score(docs))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# repetition stats


def test_repetition_stats_hand_example(spark):
    from hnormalise_spark.ops.textops import repetition_stats

    docs = _docs(
        spark,
        [
            # bigrams: "a b","b a","a b" -> top 2/3; trigrams: "a b a",
            # "b a b" -> top 1/2; no 5-gram dup (n_tok=4 -> 0 positions... n-5+1=0)
            (1, "a b a b"),
            # 6 tokens, all same: bigrams 5/5 dup, trigram 4/4, 5-grams 2, both dup
            (2, "x x x x x x"),
            (3, "one"),  # n_tok < 2: excluded
            (4, None),
        ],
    )
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert set(out) == {1, 2}
    r1 = out[1]
    assert r1["n_tok"] == 4
    assert r1["top_bigram_frac_x1e6"] == math.floor(2 * 1e6 / 3 + 0.5)
    assert r1["top_trigram_frac_x1e6"] == 500000
    assert r1["dup_5gram_frac_x1e6"] == 0  # no 5-gram positions
    r2 = out[2]
    assert r2["top_bigram_frac_x1e6"] == 1000000
    assert r2["top_trigram_frac_x1e6"] == 1000000
    assert r2["dup_5gram_frac_x1e6"] == 1000000  # both 5-grams identical


def test_repetition_stats_single_exchange(spark):
    from hnormalise_spark.ops.textops import repetition_stats

    docs = _docs(spark, [(1, "a b c d e f"), (2, "g h i j k l")])
    plan = _plan(repetition_stats(docs))
    # the doc-id repartition is the only shuffle: the (doc,k,gram)
    # window and the per-doc aggregate reuse its partitioning
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


# ---------------------------------------------------------------------------
# cross-doc duplicated spans


def test_dup_span_stats_flags_shared_trigrams(spark):
    from hnormalise_spark.ops.textops import dup_span_stats

    docs = _docs(
        spark,
        [
            (1, "p q r s"),       # trigrams: "p q r", "q r s"
            (2, "z p q r"),       # trigrams: "z p q", "p q r" (shared)
            (3, "totally different words"),
            (4, "a b"),           # < k tokens: excluded
        ],
    )
    out = {r["doc_id"]: r for r in dup_span_stats(docs, k=3).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["n_spans"] == 2 and out[1]["n_dup_spans"] == 1
    assert out[1]["dup_span_frac_x1e6"] == 500000
    assert out[2]["n_spans"] == 2 and out[2]["n_dup_spans"] == 1
    assert out[3]["n_dup_spans"] == 0


def test_dup_span_stats_within_doc_repeat_is_not_cross_doc(spark):
    from hnormalise_spark.ops.textops import dup_span_stats

    # the same trigram twice in ONE doc is not a cross-doc duplicate
    docs = _docs(spark, [(1, "p q r p q r")])
    row = dup_span_stats(docs, k=3).collect()[0]
    assert row["n_dup_spans"] == 0


# ---------------------------------------------------------------------------
# iterative BPE training vs a pure-Python reference


def _bpe_reference(texts: list[str], n_merges: int):
    """Independent reference BPE (Sennrich et al. 2016 pseudocode):
    dict-based vocab of symbol tuples, greedy left-to-right merge."""
    from collections import Counter

    vocab = Counter()
    for t in texts:
        for w in t.split():
            vocab[tuple(w)] += 1
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        # max count, ties broken lexicographically ascending
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((rank, best[0], best[1], best[0] + best[1], pairs[best]))
        new_vocab = Counter()
        for syms, c in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == best[0] and s == best[1]:
                    out[-1] = best[0] + best[1]
                else:
                    out.append(s)
            new_vocab[tuple(out)] += c
        vocab = new_vocab
    return merges


def test_bpe_train_matches_reference(spark):
    from hnormalise_spark.ops.textops import bpe_train

    texts = [
        "lower lower lowest low low low",
        "newer newest new new wider wide",
        "lower newer wider slower",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r["merge_rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_train(docs, n_merges=6).orderBy("merge_rank").collect()
    ]
    assert got == _bpe_reference(texts, 6)


def test_bpe_train_greedy_overlap_semantics(spark):
    from hnormalise_spark.ops.textops import bpe_train

    # "aaa": pair (a,a) has count 2; greedy application yields [aa, a],
    # so the SECOND merge sees pair (aa, a) with count 1 (not (a, a))
    docs = spark.createDataFrame([("aaa",)], "text string")
    got = [
        (r["left"], r["right"], r["pair_count"])
        for r in bpe_train(docs, n_merges=2).orderBy("merge_rank").collect()
    ]
    assert got == [("a", "a", 2), ("aa", "a", 1)]


# ---------------------------------------------------------------------------
# filter funnel


def test_filter_funnel_first_failing_gate_wins(spark):
    from hnormalise_spark.ops.textops import filter_funnel

    docs = _docs(
        spark,
        [
            (1, None),                                  # non_null
            (2, "   "),                                 # non_null
            (3, "short text here"),                     # min_len (3 < 20)
            (4, "a1 " * 25),                            # alpha fails AND digits high
            (5, " ".join(["goodwordtext"] * 30)),       # kept
            (6, " ".join(["word"] * 95)),               # max_len (95 > 90)
        ],
    )
    out = {r["stage"]: (r["n_docs"], r["n_tokens"]) for r in filter_funnel(docs).collect()}
    assert out["non_null"] == (2, 0)
    assert out["min_len"] == (1, 3)
    assert out["max_len"] == (1, 95)
    # doc 4 fails alpha_ratio FIRST (cascade order), never digit_ratio
    assert out["alpha_ratio"][0] == 1
    assert "digit_ratio" not in out
    assert out["kept"] == (1, 30)


def test_filter_funnel_token_mass_conserved(spark):
    from hnormalise_spark.ops.textops import filter_funnel, token_count

    docs = _docs(spark, [(i, " ".join(["w"] * (10 + i))) for i in range(1, 8)])
    total = docs.select(F.sum(token_count(F.col("text")))).collect()[0][0]
    out = filter_funnel(docs).agg(F.sum("n_tokens")).collect()[0][0]
    assert out == total


# ---------------------------------------------------------------------------
# embedding quantization


def test_quantize_embeddings_matches_numpy(spark):
    import numpy as np

    from hnormalise_spark.ops.similarity import quantize_embeddings

    rng = [[0.5, -1.0, 0.25, 0.0], [0.1, 0.2, 0.3, -0.4]]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(rng)],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    for i, v in enumerate(rng):
        v32 = np.array(v, dtype=np.float32).astype(np.float64)
        scale = float(np.max(np.abs(v32))) / 127.0
        q = np.floor(v32 / scale + 0.5).astype(int)
        err = np.floor(np.abs(v32 - q * scale) * 1e9 + 0.5).astype(np.int64)
        r = out[i]
        assert r["q"] == list(q)
        assert r["qsum"] == int(q.sum())
        assert r["err_x1e9"] == int(err.sum())
        assert r["scale_x1e9"] == int(np.floor(scale * 1e9 + 0.5))


def test_quantize_embeddings_zero_vector(spark):
    from hnormalise_spark.ops.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    r = quantize_embeddings(df).collect()[0]
    assert r["q"] == [0, 0, 0] and r["scale_x1e9"] == 0 and r["err_x1e9"] == 0


def test_quantize_embeddings_codes_bounded(spark):
    from hnormalise_spark.ops.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [1.0, -1.0, 0.999, -0.5])], "vec_id long, embedding array<float>"
    )
    r = quantize_embeddings(df).collect()[0]
    assert all(-127 <= c <= 127 for c in r["q"])
    assert r["q"][0] == 127 and r["q"][1] == -127


# ---------------------------------------------------------------------------
# streaming parity: the funnel is a plain (no-watermark) aggregation,
# so it runs under Structured Streaming in complete output mode


def test_filter_funnel_stream_equals_batch(spark, tmp_path):
    from hnormalise_spark.ops.textops import filter_funnel

    src = str(tmp_path / "src")
    df = _docs(
        spark,
        [(i, " ".join([f"w{i}"] * (5 + (i * 7) % 100))) for i in range(60)]
        + [(100, None), (101, "   ")],
    )
    df.write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        filter_funnel(stream)
        .writeStream.format("memory")
        .queryName("funnel_parity")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted(map(tuple, spark.sql("SELECT * FROM funnel_parity").collect()))
    want = sorted(map(tuple, filter_funnel(df).collect()))
    assert got == want and len(got) >= 3


# ---------------------------------------------------------------------------
# composed curation pipeline invariants (q_curation_pipeline)


def test_curation_pipeline_invariants(spark, tmp_path, monkeypatch):
    import math

    from hnormalise_spark.ops import entry as E
    from hnormalise_spark.ops.textops import lm_unigram_score, repetition_stats

    sf = str(tmp_path)
    # varied synthetic corpus: 40 normal docs over a 30-word rotating
    # vocab, one highly repetitive doc (fails the repetition gate but
    # NOT the LM band), one rare-vocab doc (high NLL, fails the band)
    rows = [
        (i, " ".join(f"w{(i + j) % 30}" for j in range(30))) for i in range(40)
    ]
    rows.append((90, " ".join(["w0"] * 40)))
    rows.append((91, " ".join(f"rare{j}xyz" for j in range(30))))
    spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "n_chars", F.length("text")
    ).write.parquet(f"{sf}/documents.parquet")

    # the shipped band is tuned for the benchmark corpus; for this
    # synthetic one, pick a band that keeps normal docs (~3.5e6) and
    # drops the rare-vocab doc (~6.5e6) — gate LOGIC is what's tested
    monkeypatch.setattr(E, "CUR_NLL_LO", 0)
    monkeypatch.setattr(E, "CUR_NLL_HI", 4_000_000)

    sel = E.q_curation_pipeline(spark, sf).collect()
    assert len(sel) > 0
    ids = {r["doc_id"] for r in sel}

    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    rep = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    lm = {r["doc_id"]: r for r in lm_unigram_score(docs).collect()}
    # every selected doc survived both gates
    for i in ids:
        assert rep[i]["top_bigram_frac_x1e6"] <= E.CUR_REP_MAX
        assert E.CUR_NLL_LO <= lm[i]["mean_nll_x1e6"] <= E.CUR_NLL_HI
    # the repetitive doc fails repetition (but passes the LM band);
    # the rare-vocab doc fails the LM band (but not repetition)
    assert rep[90]["top_bigram_frac_x1e6"] > E.CUR_REP_MAX
    assert lm[90]["mean_nll_x1e6"] <= E.CUR_NLL_HI
    assert lm[91]["mean_nll_x1e6"] > E.CUR_NLL_HI
    assert rep[91]["top_bigram_frac_x1e6"] <= E.CUR_REP_MAX
    assert 90 not in ids and 91 not in ids
    # budget respected: selected token mass <= 50% of surviving mass
    surv_tok = sum(
        rep[i]["n_tok"]
        for i in rep
        if rep[i]["top_bigram_frac_x1e6"] <= E.CUR_REP_MAX
        and i in lm
        and E.CUR_NLL_LO <= lm[i]["mean_nll_x1e6"] <= E.CUR_NLL_HI
    )
    assert sum(r["n_tok"] for r in sel) <= math.floor(surv_tok * E.CUR_BUDGET_FRAC)


# ---------------------------------------------------------------------------
# bigram LM scoring


def test_lm_bigram_score_matches_hand_computation(spark):
    from hnormalise_spark.ops.textops import lm_bigram_score

    docs = _docs(spark, [(1, "a b a"), (2, "b a")])
    out = {r["doc_id"]: r for r in lm_bigram_score(docs).collect()}
    # uni: a=3, b=2 -> T=5, V=2; bigrams: (a,b)=1, (b,a)=2
    def f(x):
        return math.floor(-math.log(x) * 1e6 + 0.5)

    # doc1: p(a)=(3+1)/(5+2); p(b|a)=(1+1)/(3+2); p(a|b)=(2+1)/(2+2)
    want1 = f(4 / 7) + f(2 / 5) + f(3 / 4)
    # doc2: p(b)=(2+1)/7; p(a|b)=(2+1)/(2+2)
    want2 = f(3 / 7) + f(3 / 4)
    assert out[1]["sum_nll_x1e6"] == want1 and out[1]["n_tok"] == 3
    assert out[2]["sum_nll_x1e6"] == want2 and out[2]["n_tok"] == 2
    assert out[1]["mean_nll_x1e6"] == want1 // 3


def test_lm_bigram_predictable_text_scores_lower(spark):
    from hnormalise_spark.ops.textops import lm_bigram_score

    # doc 1 repeats a fixed bigram chain; doc 2 is the same unigram
    # bag but shuffled order -> bigram model must prefer doc 1
    docs = _docs(spark, [(1, "a b a b a b a b"), (2, "a a b b a b b a")])
    out = {r["doc_id"]: r["mean_nll_x1e6"] for r in lm_bigram_score(docs).collect()}
    assert out[1] < out[2]


# ---------------------------------------------------------------------------
# randomized cross-checks against independent pure-Python references


def test_repetition_stats_matches_python_reference_randomized(spark):
    import random
    from collections import Counter

    from hnormalise_spark.ops.textops import repetition_stats

    rng = random.Random(0x5EED)
    vocab = [f"w{i}" for i in range(6)]  # small vocab -> real repetition
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(2, 25))))
        for i in range(1, 81)
    ]
    got = {r["doc_id"]: r for r in repetition_stats(_docs(spark, rows)).collect()}

    def frac(num, den):
        return math.floor(num * 1e6 / den + 0.5) if den else 0

    for i, text in rows:
        words = text.split()
        r = got[i]
        assert r["n_tok"] == len(words)
        for k, col, dup in [
            (2, "top_bigram_frac_x1e6", False),
            (3, "top_trigram_frac_x1e6", False),
            (5, "dup_5gram_frac_x1e6", True),
        ]:
            grams = [" ".join(words[j : j + k]) for j in range(len(words) - k + 1)]
            c = Counter(grams)
            if dup:
                want = frac(sum(v for v in c.values() if v > 1), len(grams))
            else:
                want = frac(max(c.values()), len(grams)) if grams else 0
            assert r[col] == want, (i, col)


def test_lm_bigram_matches_python_reference_randomized(spark):
    import random
    from collections import Counter

    from hnormalise_spark.ops.textops import lm_bigram_score

    rng = random.Random(0xB16)
    vocab = [f"t{i}" for i in range(9)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 15))))
        for i in range(1, 61)
    ]
    uni = Counter(w for _i, t in rows for w in t.split())
    T, V = sum(uni.values()), len(uni)
    big = Counter(
        (ws[j], ws[j + 1])
        for _i, t in rows
        for ws in [t.split()]
        for j in range(len(ws) - 1)
    )
    got = {r["doc_id"]: r for r in lm_bigram_score(_docs(spark, rows)).collect()}
    for i, text in rows:
        ws = text.split()
        want = math.floor(-math.log((uni[ws[0]] + 1) / (T + V)) * 1e6 + 0.5)
        for j in range(1, len(ws)):
            p = (big[(ws[j - 1], ws[j])] + 1) / (uni[ws[j - 1]] + V)
            want += math.floor(-math.log(p) * 1e6 + 0.5)
        assert got[i]["sum_nll_x1e6"] == want, i
        assert got[i]["mean_nll_x1e6"] == want // len(ws)


# ---------------------------------------------------------------------------
# BPE encode (applying learned merges)


def test_bpe_encode_matches_python_reference(spark):
    from hnormalise_spark.ops.textops import bpe_encode, bpe_train

    texts = ["lower lower lowest low low", "newer newest new wider wide"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = [
        (r["left"], r["right"])
        for r in bpe_train(docs, n_merges=5).orderBy("merge_rank").collect()
    ]
    got = {r["doc_id"]: r for r in bpe_encode(docs, merges).collect()}

    def encode_word(w):
        syms = list(w)
        for l_, r_ in merges:
            out = []
            for s in syms:
                if out and out[-1] == l_ and s == r_:
                    out[-1] = l_ + r_
                else:
                    out.append(s)
            syms = out
        return len(syms)

    for i, t in enumerate(texts):
        words = t.split()
        assert got[i]["n_words"] == len(words)
        assert got[i]["n_chars"] == sum(len(w) for w in words)
        assert got[i]["n_bpe_tokens"] == sum(encode_word(w) for w in words)


def test_bpe_encode_no_merges_is_char_count(spark):
    from hnormalise_spark.ops.textops import bpe_encode

    docs = _docs(spark, [(1, "ab cde")])
    r = bpe_encode(docs, []).collect()[0]
    assert r["n_bpe_tokens"] == r["n_chars"] == 5 and r["n_words"] == 2


def test_bpe_encode_monotone_in_merges(spark):
    from hnormalise_spark.ops.textops import bpe_encode, bpe_train

    docs = _docs(spark, [(1, "aaab aaab aab")])
    merges = [
        (r["left"], r["right"])
        for r in bpe_train(docs, n_merges=3).orderBy("merge_rank").collect()
    ]
    counts = [
        bpe_encode(docs, merges[:k]).collect()[0]["n_bpe_tokens"]
        for k in range(len(merges) + 1)
    ]
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert counts[0] > counts[-1]


# ---------------------------------------------------------------------------
# tf-idf keyword extraction


def test_tfidf_topk_hand_example(spark):
    from hnormalise_spark.ops.textops import tfidf_topk

    docs = _docs(
        spark,
        [
            (1, "apple apple banana common"),
            (2, "banana cherry common"),
            (3, "cherry cherry cherry common"),
        ],
    )
    out = {}
    for r in tfidf_topk(docs, k=2).collect():
        out.setdefault(r["doc_id"], []).append((r["term"], r["tfidf_x1e6"]))

    def score(tf, df):
        return math.floor(tf * math.log(4 / (df + 1)) * 1e6 + 0.5)

    # doc1: apple tf=2 df=1 beats banana tf=1 df=2; 'common' df=3 -> 0
    assert out[1][0] == ("apple", score(2, 1))
    assert out[1][1] == ("banana", score(1, 2))
    # doc3: cherry tf=3 df=2 dominates
    assert out[3][0] == ("cherry", score(3, 2))
    assert all(len(v) == 2 for v in out.values())


def test_tfidf_topk_no_composite_shuffle(spark):
    import re

    from hnormalise_spark.ops.textops import tfidf_topk

    docs = _docs(spark, [(1, "a b c"), (2, "c d e")])
    plan = tfidf_topk(docs)._jdf.queryExecution().executedPlan().toString()
    # the (doc, term) tf aggregate and the per-doc top-k window both
    # reuse the doc repartition: no shuffle keyed on the composite
    # (corpus-sized) key may appear — only doc-keyed exchanges plus the
    # vocabulary-sized term aggregate feeding the broadcast
    assert not re.search(r"hashpartitioning\(_doc#\d+L?, term", plan), plan
    assert re.search(r"hashpartitioning\(_doc#\d+L?, \d+\)", plan), plan


def test_quantized_cosine_ranking_and_reconstruction_bound(spark):
    """Dequantized (q * scale) vectors reconstruct within scale/2 per
    element, and on well-separated vectors int8 scoring preserves the
    exact cosine ranking (the ann_quantized query's premise)."""
    import math

    from pyspark.sql import functions as F

    from hnormalise_spark.ops.similarity import cosine_scores, quantize_embeddings

    vecs = {
        1: [1.0, 0.0, 0.0],
        2: [0.8, 0.6, 0.0],    # cos vs [1,0,0] = 0.8
        3: [0.0, 1.0, 0.0],    # cos = 0
        4: [0.5, 0.5, 0.7071], # cos ~ 0.5
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in vecs.items()], "vec_id long, embedding array<float>"
    )
    qz = quantize_embeddings(df)
    deq = qz.select(
        "vec_id", "embedding",
        F.transform(
            "q",
            lambda x: x.cast("double") * (F.col("scale_x1e9").cast("double") / F.lit(1e9)),
        ).alias("deq"),
    )
    for r in deq.collect():
        scale = max(abs(x) for x in vecs[r["vec_id"]]) / 127.0
        for orig, rec in zip(r["embedding"], r["deq"]):
            # scale_x1e9 rounding adds <= 0.5e-9 per unit of |q| <= 127
            assert abs(orig - rec) <= scale / 2 + 127 * 1e-9

    q = [1.0, 0.0, 0.0]
    exact_rank = [r["vec_id"] for r in cosine_scores(df, q)
                  .orderBy(F.desc("cosine"), "vec_id").collect()]
    approx_rank = [r["vec_id"] for r in cosine_scores(
        deq.select("vec_id", F.col("deq").alias("embedding")), q)
        .orderBy(F.desc("cosine"), "vec_id").collect()]
    assert exact_rank == approx_rank == [1, 2, 4, 3]
