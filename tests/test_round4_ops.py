"""Round-4 LLM-pipeline operators: decontamination, PII redaction,
sequence packing, resharding — unit semantics plus the plan shapes
(broadcast decontamination join, shuffle counts)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# decontamination


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_exact_ngram_overlap(spark):
    from hnormalise_spark.ops import decontam as D

    eight = "a b c d e f g h"
    docs = _docs(
        spark,
        [
            (1, eight + " tail words here"),          # contains the eval 8-gram
            (2, "totally different words one two three four five six"),
            (3, "x " + eight),                         # 8-gram at offset 2
            (4, "a b c d e f g"),                      # only 7 words: no 8-gram
        ],
    )
    ev = D.eval_ngram_hashes(_docs(spark, [(99, eight)]), "text", 8)
    out = {
        r["doc_id"]: (r["contaminated"], r["n_eval_hits"])
        for r in D.decontaminate(docs, ev, n=8).collect()
    }
    assert out[1] == (1, 1)
    assert out[2] == (0, 0)
    assert out[3] == (1, 1)
    assert out[4] == (0, 0)


def test_decontaminate_counts_distinct_hits_once(spark):
    from hnormalise_spark.ops import decontam as D

    g = "a b c d e f g h"
    # the same eval gram appears twice in one doc -> ONE distinct hit
    docs = _docs(spark, [(1, g + " " + g)])
    ev = D.eval_ngram_hashes(_docs(spark, [(9, g)]), "text", 8)
    row = D.decontaminate(docs, ev, n=8).collect()[0]
    assert row["n_eval_hits"] == 1 and row["contaminated"] == 1


def test_decontaminate_short_text_empty_grams(spark):
    from hnormalise_spark.ops.decontam import word_ngram_hashes

    df = spark.createDataFrame([("a b",), ("",), ("   ",)], "t string")
    sizes = [
        r["n"]
        for r in df.select(F.size(word_ngram_hashes(F.col("t"), 8)).alias("n")).collect()
    ]
    assert sizes == [0, 0, 0]


def test_decontaminate_plan_broadcasts_eval_set(spark):
    from hnormalise_spark.ops import decontam as D

    docs = _docs(spark, [(1, "a b c d e f g h i")])
    ev = D.eval_ngram_hashes(docs, "text", 8)
    plan = _plan(D.decontaminate(docs, ev, n=8))
    # the corpus side must never shuffle: eval grams and the hit table
    # both attach as broadcasts
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# PII redaction


def test_redact_pii_masks_and_counts(spark):
    from hnormalise_spark.ops.textops import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail me first.last+x@sub.example.org now"),
            (2, "host 10.1.255.3 and 192.168.0.1 up"),
            (3, "call 555-123-4567 or 555 987 6543"),
            (4, "clean text with no pii at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[1]["n_email"] == 1 and "<EMAIL>" in out[1]["text_redacted"]
    assert "@" not in out[1]["text_redacted"]
    assert out[2]["n_ip"] == 2 and out[2]["text_redacted"].count("<IP>") == 2
    assert out[3]["n_phone"] == 2 and out[3]["text_redacted"].count("<PHONE>") == 2
    r4 = out[4]
    assert (r4["n_email"], r4["n_ip"], r4["n_phone"]) == (0, 0, 0)
    assert r4["text_redacted"] == "clean text with no pii at all"


def test_redact_pii_no_double_count_across_classes(spark):
    from hnormalise_spark.ops.textops import redact_pii

    df = spark.createDataFrame(
        [
            # dashed local part looks like a phone number: the email
            # pass consumes it first, the phone count sees <EMAIL>
            (1, "reach 555-123-4567@corp.example.com today"),
            # numeric-host "@" junk is NOT an email (no alpha TLD);
            # both dotted quads redact as IPs
            (2, "x 1.2.3.4@5.6.7.8 y"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    r1 = out[1]
    assert (r1["n_email"], r1["n_phone"]) == (1, 0)
    assert r1["text_redacted"] == "reach <EMAIL> today"
    r2 = out[2]
    assert (r2["n_email"], r2["n_ip"]) == (0, 2)
    assert r2["text_redacted"] == "x <IP>@<IP> y"


# ---------------------------------------------------------------------------
# sequence packing


def test_pack_sequences_cumsum_invariants(spark):
    from hnormalise_spark.ops import packing as P

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (i % 13 + 1))) for i in range(200)],
        "doc_id long, text string",
    )
    out = P.pack_sequences(docs, ctx=16, shards=4).collect()
    assert len(out) == 200
    by_shard: dict[int, list] = {}
    for r in out:
        assert 0 <= r["shard"] < 4
        assert r["n_tok"] == r["doc_id"] % 13 + 2  # words + EOD
        assert 0 <= r["block_off"] < 16
        assert r["n_blocks"] >= 1
        by_shard.setdefault(r["shard"], []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rows:
            first = r["block_id"] - r["shard"] * (1 << 32)
            assert first == cum // 16
            assert r["block_off"] == cum % 16
            assert r["n_blocks"] == (cum + r["n_tok"] - 1) // 16 - cum // 16 + 1
            cum += r["n_tok"]


def test_pack_sequences_deterministic(spark):
    from hnormalise_spark.ops import packing as P

    docs = spark.createDataFrame(
        [(i, "a b c") for i in range(50)], "doc_id long, text string"
    )
    a = sorted(map(tuple, P.pack_sequences(docs, ctx=8).collect()))
    b = sorted(map(tuple, P.pack_sequences(docs.repartition(7), ctx=8).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# resharding


def test_reshard_dense_positions_and_determinism(spark):
    from hnormalise_spark.ops import packing as P

    docs = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    out = P.reshard(docs, 8).collect()
    assert len(out) == 300
    by_shard: dict[int, list] = {}
    for r in out:
        assert 0 <= r["shard"] < 8
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    total = 0
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss)))
        total += len(poss)
    assert total == 300
    again = P.reshard(docs.repartition(5), 8).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_reshard_single_exchange(spark):
    from hnormalise_spark.ops import packing as P

    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    plan = _plan(P.reshard(docs, 8))
    assert plan.count("Exchange") == 1


# ---------------------------------------------------------------------------
# incremental dedup against the persisted fingerprint index


def test_dedup_against_index_flags_known_and_novel(spark, tmp_path):
    from hnormalise_spark.ops import dedup as D

    idx = str(tmp_path / "fpidx")
    hist = spark.createDataFrame(
        [(1, "hello world"), (2, "spark rows"), (3, "hello world")],
        "doc_id long, text string",
    )
    D.build_fingerprint_index(hist, idx)
    # resume: rebuilding is a committed no-op
    D.build_fingerprint_index(hist, idx)
    batch = spark.createDataFrame(
        [
            (100, "  HELLO   world "),   # normalises to a known fingerprint
            (101, "brand new text"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in D.dedup_against_index(spark, batch, idx).collect()}
    assert out[100]["is_known_dup"] == 1 and out[100]["dup_of"] == 1
    assert out[101]["is_known_dup"] == 0 and out[101]["dup_of"] is None


def test_dedup_against_index_prunes_partitions(spark, tmp_path):
    from hnormalise_spark.ops import dedup as D

    idx = str(tmp_path / "fpidx")
    hist = spark.createDataFrame(
        [(i, f"text number {i}") for i in range(64)], "doc_id long, text string"
    )
    D.build_fingerprint_index(hist, idx)
    batch = spark.createDataFrame([(99, "text number 7")], "doc_id long, text string")
    df = D.dedup_against_index(spark, batch, idx)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "fp_bucket" in plan.split("PartitionFilters:")[1][:200]
    assert df.collect()[0]["dup_of"] == 7


# ---------------------------------------------------------------------------
# per-group exact quantiles


def test_doclen_stats_exact_rank_quantiles(spark):
    from hnormalise_spark.ops.textops import doclen_stats

    rows = [(f"d{i}", "a", " ".join(["w"] * i)) for i in range(1, 11)]
    rows.append(("s", "b", "one two three"))
    df = spark.createDataFrame(rows, "doc_id string, lang string, text string")
    out = {r["lang"]: r for r in doclen_stats(df).collect()}
    a = out["a"]
    # n_tok 1..10: rank selection floor((n-1)*p) of the ascending sort
    assert (a["n_docs"], a["min_tok"], a["max_tok"]) == (10, 1, 10)
    assert (a["p10"], a["p50"], a["p90"]) == (1, 5, 9)
    assert a["mean_tok_x1e4"] == 55000
    b = out["b"]
    assert (b["p10"], b["p50"], b["p90"]) == (3, 3, 3)


def test_doclen_stats_single_exchange(spark):
    from hnormalise_spark.ops.textops import doclen_stats

    df = spark.createDataFrame([("d", "a", "x y")], "doc_id string, lang string, text string")
    plan = doclen_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


# ---------------------------------------------------------------------------
# null-text behaviour (documented: null-in-null-out for row-level ops,
# null rows excluded from corpus stats)


def test_round4_ops_null_text(spark):
    from hnormalise_spark.ops import packing as P
    from hnormalise_spark.ops.decontam import word_ngram_hashes
    from hnormalise_spark.ops.textops import doclen_stats, redact_pii

    df = spark.createDataFrame(
        [(1, "three word text", "a"), (2, None, "a"), (3, "x y", "a")],
        "doc_id long, text string, lang string",
    )
    # redaction propagates null
    r = {x["doc_id"]: x for x in redact_pii(df).collect()}
    assert r[2]["text_redacted"] is None and r[2]["n_email"] is None
    # n-gram hashes of null text: empty array (a null doc has no
    # grams, so it can never be flagged contaminated)
    g = df.select(F.size(word_ngram_hashes(F.col("text"), 2)).alias("n")).collect()
    assert sorted(x["n"] for x in g) == [0, 1, 2]
    # packing: a null doc occupies no tokens (n_tok/n_blocks null) but
    # still has a well-defined start position; the cumsum skips it
    packed = {x["doc_id"]: x for x in P.pack_sequences(df, ctx=8, shards=1).collect()}
    assert packed[2]["n_tok"] is None and packed[2]["n_blocks"] is None
    assert packed[1]["n_tok"] == 4 and packed[3]["n_tok"] == 3
    assert packed[1]["block_off"] == 0  # doc order 1, 2, 3 in the shard
    assert packed[2]["block_off"] == 4  # starts after doc 1...
    assert packed[3]["block_off"] == 4  # ...and doc 3 starts at the same spot
    # corpus stats: null rows excluded entirely
    s = doclen_stats(df).collect()[0]
    assert s["n_docs"] == 2 and (s["min_tok"], s["max_tok"]) == (2, 3)


# ---------------------------------------------------------------------------
# weighted source mixing


def test_mix_sources_stride_ratio_and_determinism(spark):
    from hnormalise_spark.ops import packing as P

    rows = [(i, "a") for i in range(120)] + [(1000 + i, "b") for i in range(120)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = P.mix_sources(docs, {"a": 2.0, "b": 1.0}, shards=1)
    ordered = [r["source"] for r in out.orderBy("pos").collect()]
    # weight 2 source appears ~2x as often in any early window of the
    # interleave (until a runs dry)
    head = ordered[:90]
    assert abs(head.count("a") / max(head.count("b"), 1) - 2.0) < 0.35
    # virtual-time math: i-th doc of source s at vt = i / w_s
    vts = {(r["source"], r["pos"]): r["vt"] for r in out.collect()}
    a_vts = sorted(v for (s, _), v in vts.items() if s == "a")
    assert a_vts[:4] == [0.5, 1.0, 1.5, 2.0]
    # unknown sources are dropped
    docs2 = spark.createDataFrame([(1, "a"), (2, "zz")], "doc_id long, source string")
    assert P.mix_sources(docs2, {"a": 1.0}, shards=1).count() == 1
    # deterministic under repartitioning
    x = sorted(map(tuple, out.collect()))
    y = sorted(map(tuple, P.mix_sources(docs.repartition(7), {"a": 2.0, "b": 1.0}, shards=1).collect()))
    assert x == y


def test_mix_sources_positions_dense_per_shard(spark):
    from hnormalise_spark.ops import packing as P

    docs = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(200)], "doc_id long, source string"
    )
    out = P.mix_sources(docs, {"a": 1.0, "b": 3.0}, shards=4).collect()
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert sum(len(v) for v in by_shard.values()) == 200
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))


# ---------------------------------------------------------------------------
# streaming parity: the row-level round-4 ops are stateless projections,
# so they compose with Structured Streaming unchanged


def test_redact_pii_stream_equals_batch(spark, tmp_path):
    import os

    from hnormalise_spark.ops.textops import redact_pii

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    df = spark.createDataFrame(
        [(i, f"doc {i} mail u{i}@x{i}.example.com ip 10.0.0.{i % 250}") for i in range(40)],
        "doc_id long, text string",
    )
    df.write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        redact_pii(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(map(tuple, redact_pii(df).collect()))
    assert got == want and len(got) == 40


# ---------------------------------------------------------------------------
# BPE pair counting (tokenizer-training first iteration)


def test_bpe_pair_counts_weighted_by_word_frequency(spark):
    from hnormalise_spark.ops.textops import bpe_pair_counts

    # "ab" x3 (one doc has it twice), "abc" x1, single char "z" ignored
    df = spark.createDataFrame(
        [(1, "ab ab z"), (2, "ab abc")], "doc_id long, text string"
    )
    out = {r["pair"]: r["n_pairs"] for r in bpe_pair_counts(df, k=10).collect()}
    # vocab: ab(wc=3) -> pair 'ab' x3; abc(wc=1) -> 'ab','bc'
    assert out == {"ab": 4, "bc": 1}


def test_bpe_pair_counts_within_word_repeats(spark):
    from hnormalise_spark.ops.textops import bpe_pair_counts

    # 'aaa' contains the pair 'aa' twice (true BPE occurrence counting)
    df = spark.createDataFrame([(1, "aaa")], "doc_id long, text string")
    out = {r["pair"]: r["n_pairs"] for r in bpe_pair_counts(df).collect()}
    assert out == {"aa": 2}


# ---------------------------------------------------------------------------
# composed training pipeline (q_training_pipeline invariants)


def test_training_pipeline_composition_invariants(spark, tmp_path):
    from hnormalise_spark.ops import entry as E
    from hnormalise_spark.ops.textops import quality_score, token_count

    sf = str(tmp_path)
    letters = "abcdefghijklmnopqrstuvw"
    # per-doc unique word prefix so no 8-gram crosses documents (the
    # eval docs self-hit and drop; everything else stays clean)
    rows = [
        (
            i,
            " ".join(
                letters[i % 23] + letters[(i // 23) % 23] + letters[j % 23]
                for j in range(10 + i % 60)
            ),
        )
        for i in range(200)
    ]
    rows.append((900, "x"))            # below the token band -> gated out
    rows.append((901, rows[5][1]))     # exact dup of doc 5 -> dropped
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    docs.write.parquet(f"{sf}/documents.parquet")

    out = E.q_training_pipeline(spark, sf).collect()
    ids = {r["doc_id"] for r in out}
    assert 900 not in ids and 901 not in ids
    # every survivor passes the quality gate
    gated = {
        r["doc_id"]
        for r in docs.filter(
            token_count(F.col("text")).between(E.TP_MIN_TOK, E.TP_MAX_TOK)
            & (quality_score(F.col("text")) >= E.TP_MIN_Q)
        ).collect()
    }
    assert ids <= gated and len(ids) > 50
    # pack coordinates are well-formed
    for r in out:
        assert 0 <= r["block_off"] < E.TP_CTX
        assert r["n_blocks"] >= 1 and 0 <= r["shard"] < E.TP_SHARDS
