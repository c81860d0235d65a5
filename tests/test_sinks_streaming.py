"""Routing/sink invariants, enrichment joins, streaming parity.

Checks the north-rule contracts: per-sink routed-row set equality,
failure sink carries originals (token-array equality), counts match,
streaming foreachBatch produces the same routed sets as batch, and
enrichment joins are broadcast (no shuffle of the fact side).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hnormalise_spark import enrich, pipeline as P, sinks, streaming
from hnormalise_spark.datagen import raw_sequences
from hnormalise_spark.tokenizer import detokenize_col

N = 2000


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus"))
    raw_sequences(spark, N, partitions=4).write.mode("overwrite").parquet(d)
    return d


def test_batch_fanout_invariants(spark, corpus_dir, tmp_path):
    df = spark.read.parquet(corpus_dir)
    parsed = sinks.with_lineage(P.normalise_tokens(df))
    paths = sinks.run_batch(spark, parsed, str(tmp_path / "out"))

    staging = spark.read.parquet(paths["staging"])
    success = spark.read.parquet(paths["success"])
    failure = spark.read.parquet(paths["failure"])
    counts = spark.read.parquet(paths["counts"])

    n_s, n_f = success.count(), failure.count()
    assert n_s + n_f == N
    # routed-row set equality: success ∪ failure doc_ids == input doc_ids
    assert success.select("doc_id").union(failure.select("doc_id")).distinct().count() == N

    # failure sink carries original tokens untouched (token-array equality)
    orig = df.select("doc_id", F.col("tokens").alias("tokens_in"))
    joined = failure.join(orig, "doc_id")
    assert joined.filter(F.col("tokens") != F.col("tokens_in")).count() == 0
    # and raw text round-trips from tokens
    assert (
        failure.filter(detokenize_col("tokens") != F.col("raw")).count() == 0
    )

    # counts equal direct aggregation and sum to N
    assert counts.agg(F.sum("n")).collect()[0][0] == N
    direct = {
        (r["source"], r["parser"], r["parse_ok"]): r["n"]
        for r in P.counts(staging).collect()
    }
    from_sink = {
        (r["source"], r["parser"], r["parse_ok"]): r["n"] for r in counts.collect()
    }
    assert direct == from_sink

    # lineage stamps present on both sinks
    assert "lineage_partition" in success.columns and "lineage_file" in failure.columns

    # success rows all have a parser + payload in the right family column
    assert success.filter(F.col("parser").isNull()).count() == 0


def test_streaming_matches_batch(spark, corpus_dir, tmp_path):
    out = str(tmp_path / "stream_out")
    q = streaming.start_pipeline(spark, corpus_dir, out, available_now=True)
    q.awaitTermination(300)

    success = spark.read.option("basePath", out + "/success").parquet(out + "/success")
    failure = spark.read.option("basePath", out + "/failure").parquet(out + "/failure")
    counts = spark.read.option("basePath", out + "/counts").parquet(out + "/counts")

    df = spark.read.parquet(corpus_dir)
    batch = P.normalise_tokens(df)
    batch_ok = {r["doc_id"] for r in batch.filter("parse_ok").select("doc_id").collect()}
    stream_ok = {r["doc_id"] for r in success.select("doc_id").collect()}
    assert batch_ok == stream_ok
    assert failure.count() == N - len(batch_ok)

    # summed batch counts == batch counts (running-counter semantics)
    summed = {
        (r["source"], r["parser"], r["parse_ok"]): r["total"]
        for r in counts.groupBy("source", "parser", "parse_ok")
        .agg(F.sum("n").alias("total"))
        .collect()
    }
    direct = {
        (r["source"], r["parser"], r["parse_ok"]): r["n"]
        for r in P.counts(batch).collect()
    }
    assert summed == direct


def test_streaming_resume_idempotent(spark, corpus_dir, tmp_path):
    """Restarting a drained query must not duplicate sink rows."""
    out = str(tmp_path / "resume_out")
    q = streaming.start_pipeline(spark, corpus_dir, out, available_now=True)
    q.awaitTermination(300)
    n1 = spark.read.parquet(out + "/success").count()
    q2 = streaming.start_pipeline(spark, corpus_dir, out, available_now=True)
    q2.awaitTermination(300)
    n2 = spark.read.parquet(out + "/success").count()
    assert n1 == n2


def test_enrichment_broadcast(spark, corpus_dir):
    df = spark.read.parquet(corpus_dir)
    parsed = P.normalise_tokens(df)
    hm, cm, um = enrich.synth_lookup_tables(spark)
    enriched = enrich.enrich(parsed, hm, cm, um)

    plan = enriched._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan and "Exchange hashpartitioning" not in plan

    # every parsed hostname that exists in host_meta is enriched
    hit = enriched.filter(F.col("parse_ok") & F.col("host_cluster").isNotNull())
    sample = hit.select("hostname", "host_cluster", "cluster_site").limit(5).collect()
    assert sample, "expected at least some enriched rows"
    for r in sample:
        assert r["host_cluster"] in r["hostname"]
    # snoopy uid join resolves usernames
    sn = enriched.filter(F.col("parser") == "snoopy").filter(
        F.col("uid_username").isNotNull()
    )
    assert sn.count() > 0


def test_read_raw_text_batch_roundtrip(spark, tmp_path):
    """Raw syslog text files (the reference's native input) enter the
    SAME normalise() transform: every fixture line routes exactly as it
    does from the tokenized parquet path."""
    from hnormalise_spark.fixtures import CORPUS
    from hnormalise_spark.streaming import read_raw_text
    from hnormalise_spark import pipeline as P

    log = tmp_path / "syslog.log"
    lines = [l for (_, _, _, l) in CORPUS if l and "\n" not in l]
    log.write_text("\n".join(lines) + "\n")
    df = read_raw_text(spark, str(log))
    assert df.columns[:3] == ["doc_id", "source", "raw"]
    parsed = P.normalise(df)
    got = {
        (r["parser"], r["parse_ok"]): r["n"]
        for r in P.counts(parsed, keys=("parser", "parse_ok")).collect()
    }
    want_ok = {}
    for (_, _, parser, l) in CORPUS:
        if l and "\n" not in l and parser:
            want_ok[parser] = want_ok.get(parser, 0) + 1
    for parser, n in want_ok.items():
        assert got.get((parser, True)) == n, parser
    assert sum(n for (p, ok), n in got.items() if not ok) == sum(
        1 for (_, _, p, l) in CORPUS if l and "\n" not in l and p is None
    )
    # doc_ids are unique and carry the file name
    ids = [r["doc_id"] for r in df.select("doc_id").collect()]
    assert len(set(ids)) == len(lines) and all(i.startswith("syslog.log-") for i in ids)


def test_read_raw_text_stream_routes(spark, tmp_path):
    """The streaming text source feeds the identical transform; one
    micro-batch routes success/failure exactly like batch."""
    from hnormalise_spark.fixtures import CORPUS
    from hnormalise_spark.streaming import read_raw_text_stream
    from hnormalise_spark import pipeline as P

    in_dir = tmp_path / "logs"
    in_dir.mkdir()
    lines = [l for (_, _, _, l) in CORPUS if l and "\n" not in l]
    (in_dir / "a.log").write_text("\n".join(lines) + "\n")
    parsed = P.normalise(read_raw_text_stream(spark, str(in_dir)))
    out = parsed.groupBy("parse_ok").count()
    q = (
        out.writeStream.format("memory")
        .queryName("raw_text_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["parse_ok"]: r["count"] for r in spark.sql("select * from raw_text_counts").collect()}
    n_fail = sum(1 for (_, _, p, l) in CORPUS if l and "\n" not in l and p is None)
    assert got[False] == n_fail
    assert got[True] == len(lines) - n_fail
