"""Snapshot-manifest table layer, S7 debug sink, Kafka builder,
windowed watermarked counts."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hnormalise_spark import pipeline as P, sinks, streaming, table as T
from hnormalise_spark.datagen import raw_sequences

N = 1000


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus_extras"))
    raw_sequences(spark, N, partitions=2).write.mode("overwrite").parquet(d)
    return d


# ---------------------------------------------------------------------------
# table.py — snapshot manifest


def test_snapshot_commit_then_visible(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    df = spark.range(10).toDF("id")
    assert T.write_snapshot(df, tbl, "s1") is True
    # second write of the same id is a committed no-op
    assert T.write_snapshot(df, tbl, "s1") is False
    assert T.committed_snapshot_ids(tbl) == ["s1"]
    assert T.read_committed(spark, tbl).count() == 10
    assert T.read_snapshot(spark, tbl, "s1").count() == 10

    # an uncommitted orphan data dir is invisible to readers
    spark.range(5).toDF("id").write.parquet(T.snapshot_data_path(tbl, "s2"))
    assert T.read_committed(spark, tbl).count() == 10
    with pytest.raises(FileNotFoundError):
        T.read_snapshot(spark, tbl, "s2")
    # a retried snapshot overwrites the orphan, then commits
    assert T.write_snapshot(spark.range(7).toDF("id"), tbl, "s2") is True
    assert T.read_committed(spark, tbl).count() == 17


def test_run_batch_snapshot_resume(spark, corpus_dir, tmp_path):
    out = str(tmp_path / "out")
    df = spark.read.parquet(corpus_dir)
    parsed = P.normalise_tokens(df)
    paths = sinks.run_batch(spark, parsed, out, snapshot_id="batch-001")
    assert T.is_committed(out, "batch-001")
    n1 = spark.read.parquet(paths["counts"]).agg(F.sum("n")).collect()[0][0]
    assert n1 == N

    # committed id: resume is a no-op (staging untouched)
    mtime = os.path.getmtime(os.path.join(paths["staging"], "_SUCCESS"))
    sinks.run_batch(spark, parsed, out, snapshot_id="batch-001")
    assert os.path.getmtime(os.path.join(paths["staging"], "_SUCCESS")) == mtime

    # crash before commit (manifest wiped): rerun redoes the work
    os.remove(T._manifest_path(out))
    sinks.run_batch(spark, parsed, out, snapshot_id="batch-001")
    assert os.path.getmtime(os.path.join(paths["staging"], "_SUCCESS")) > mtime
    assert T.is_committed(out, "batch-001")


def test_iceberg_probe_is_honest(spark):
    # the sandbox image has no Iceberg runtime jar; the probe must say
    # so (on a cluster with the jar this flips and write_snapshot uses
    # the writeTo path)
    assert T.iceberg_available(spark) is False


# ---------------------------------------------------------------------------
# S7 debug sink (mySink, Communication/File.hs:50-67)


def test_debug_sink_prefixes(spark, corpus_dir, tmp_path):
    out = str(tmp_path / "debug")
    parsed = P.normalise_tokens(spark.read.parquet(corpus_dir))
    sinks.write_debug(parsed, out)
    lines = [r["value"] for r in spark.read.text(out).collect()]
    assert len(lines) == N
    ok = [l for l in lines if l.startswith("success: ")]
    fail = [l for l in lines if l.startswith("fail - original: ")]
    assert len(ok) + len(fail) == N and ok and fail
    # success lines carry the reference-shaped JSON object
    assert ok[0][len("success: "):].startswith("{")
    # failure lines carry the ORIGINAL line verbatim
    raws = {r["raw"] for r in parsed.filter(~F.col("parse_ok")).select("raw").collect()}
    assert {l[len("fail - original: "):] for l in fail} == raws


# ---------------------------------------------------------------------------
# Kafka builder (sandbox: connector jar absent — construction only)


def test_kafka_reader_builds(spark):
    reader = streaming.kafka_stream_reader(spark, "broker:9092", "syslog")
    # options are set on the builder; load() needs the connector jar,
    # which this sandbox does not ship — expect the clean
    # data-source-not-found error, not a crash elsewhere
    import py4j.protocol

    with pytest.raises(Exception) as ei:
        reader.load()
    assert "kafka" in str(ei.value).lower()


def test_kafka_decode_shape(spark):
    # decode_kafka_lines contract, checked against a static frame with
    # the Kafka source schema
    df = spark.createDataFrame(
        [("syslog", 0, 42, bytearray(b"<13>1 2017-05-24T18:01:01+02:00 h t - msg"))],
        "topic string, partition int, offset long, value binary",
    )
    out = streaming.decode_kafka_lines(df)
    row = out.collect()[0]
    assert row["doc_id"] == "syslog-0-42"
    assert row["source"] == "syslog"
    assert row["raw"].startswith("<13>1 ")


# ---------------------------------------------------------------------------
# windowed watermarked counts (§2.7) — previously untested


def test_windowed_counts_match_batch(spark, corpus_dir, tmp_path):
    out = str(tmp_path / "wc")
    q = streaming.windowed_counts(spark, corpus_dir, out, window="1 hour", watermark="10 minutes")
    q.awaitTermination(300)

    wc = spark.read.parquet(os.path.join(out, "windowed_counts"))
    batch = P.normalise_tokens(spark.read.parquet(corpus_dir))

    # Append mode emits a window only once the watermark passes its
    # end; the final (still-open) hour window is withheld when the
    # availableNow query drains. Emitted set = windows whose end <=
    # max(event_time) - watermark delay.
    ts = F.col("timereported")
    stamped = batch.filter(ts.isNotNull()).withColumn(
        "_wend", F.date_trunc("hour", ts) + F.expr("INTERVAL 1 HOUR")
    )
    wm = stamped.agg(
        F.max(ts) - F.expr("INTERVAL 10 MINUTES")
    ).collect()[0][0]
    closed = stamped.filter(F.col("_wend") <= F.lit(wm))
    assert wc.agg(F.sum("n")).collect()[0][0] == closed.count()

    # per-(source, parser, ok) sums equal the batch aggregation over
    # the closed windows
    summed = {
        (r["source"], r["parser"], r["parse_ok"]): r["t"]
        for r in wc.groupBy("source", "parser", "parse_ok").agg(F.sum("n").alias("t")).collect()
    }
    direct = {
        (r["source"], r["parser"], r["parse_ok"]): r["n"]
        for r in P.counts(closed).collect()
    }
    assert summed == direct

    # window boundaries are hour-aligned tumbling windows
    w = wc.select("window.start", "window.end").first()
    assert (w["end"] - w["start"]).total_seconds() == 3600


def test_windowed_counts_drops_late_rows(spark, corpus_dir, tmp_path):
    """Restart with a file whose event times are far behind the
    checkpointed watermark: the late rows must not change the counts."""
    out = str(tmp_path / "wc_late")
    src = str(tmp_path / "src")
    import shutil

    shutil.copytree(corpus_dir, src)
    q = streaming.windowed_counts(spark, src, out, window="1 hour", watermark="10 minutes")
    q.awaitTermination(300)
    wc_path = os.path.join(out, "windowed_counts")
    n_before = spark.read.parquet(wc_path).agg(F.sum("n")).collect()[0][0]

    # late file: corpus timestamps span 2017-05-24; watermark after
    # batch 1 sits near 23:59 - 10min, so 00:00:05 rows are late
    from hnormalise_spark.tokenizer import retokenize_col

    late_line = (
        "<13>1 2017-05-24T00:00:05+02:00 h snoopy[1]: - snoopy[1]::  "
        "[uid:1 sid:1 tty:(none) cwd:/ filename:/bin/ls]: /bin/ls"
    )
    late = (
        spark.createDataFrame([("late-1", "snoopy", late_line)],
                              "doc_id string, source string, raw string")
        .select(
            "doc_id",
            retokenize_col("raw").alias("tokens"),
            F.length("raw").cast("int").alias("n_tok"),
            "source",
        )
    )
    late.write.mode("append").parquet(src)

    q2 = streaming.windowed_counts(spark, src, out, window="1 hour", watermark="10 minutes")
    q2.awaitTermination(300)
    n_after = spark.read.parquet(wc_path).agg(F.sum("n")).collect()[0][0]
    assert n_after == n_before


# ---------------------------------------------------------------------------
# streaming session windows (native session_window, watermarked)


def test_streaming_sessions_match_batch_sessionize(spark, corpus_dir, tmp_path):
    """The streaming session_window aggregation must agree with the
    batch gap rule (ops.timeseries.sessionize) on every CLOSED
    session: same (source, session_start, n_events) triples."""
    from hnormalise_spark.ops import timeseries as T

    out = str(tmp_path / "sess")
    q = streaming.streaming_sessions(
        spark, corpus_dir, out, key_col="source", gap="3 minutes", watermark="10 minutes"
    )
    q.awaitTermination(300)
    emitted = spark.read.parquet(os.path.join(out, "sessions"))

    batch = P.normalise_tokens(spark.read.parquet(corpus_dir))
    ts = F.col("timereported")
    stamped = batch.filter(ts.isNotNull())
    sess = T.sessionize(stamped, ts_col="timereported", user_col="source", gap_seconds=180)
    per = sess.groupBy("source", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("timereported").alias("start"),
        F.max("timereported").alias("last"),
    )
    wm = stamped.agg(F.max(ts) - F.expr("INTERVAL 10 MINUTES")).collect()[0][0]
    closed = per.filter(
        F.col("last") + F.expr("INTERVAL 3 MINUTES") <= F.lit(wm)
    )

    got = {
        (r["source"], r["session_start"], r["n_events"])
        for r in emitted.collect()
    }
    want = {
        (r["source"], r["start"], r["n_events"]) for r in closed.collect()
    }
    assert got == want and len(got) > 10
    # session_window end = last event + gap
    spans = {r["session_start"]: r["session_end"] for r in emitted.collect()}
    lasts = {r["start"]: r["last"] for r in closed.collect()}
    for s, e in spans.items():
        assert (e - lasts[s]).total_seconds() == 180.0


# ---------------------------------------------------------------------------
# custom stateful streaming op: exact dedup via applyInPandasWithState


def test_streaming_dedup_bounded_expires_and_readmits(spark, tmp_path):
    """EventTimeTimeout variant: fingerprints unseen for the TTL are
    dropped from the state store (bounded state at scale) and a LATER
    occurrence re-admits. Drives 4 micro-batches whose event times
    cross a 1-hour TTL and checks (a) the duplicate within the TTL is
    suppressed, (b) the occurrence after expiry is emitted again,
    (c) the state row count SHRINKS when the timeout fires."""
    import time as _time

    from hnormalise_spark.tokenizer import tokenize_pandas

    def _line(hhmm, body):
        return (
            f"<13>1 2017-05-24T{hhmm}:00+00:00 host tag - snoopy[7]::  "
            f"[uid:1 sid:1 tty:(none) cwd:/ filename:/bin/{body}]: /bin/{body}"
        )

    # ttl = 1h. A and B expire once the watermark (max event time - 1s)
    # passes their last-seen + 1h: that happens in batch 3 (wm ~13:00
    # after batch 2 > 11:00). A's batch-4 occurrence is POST-expiry.
    batches = [
        [("a0", _line("10:00", "A")), ("a1", _line("10:00", "A")),
         ("b1", _line("10:00", "B"))],
        [("c1", _line("13:00", "C"))],
        [("d1", _line("13:30", "D"))],
        [("a2", _line("13:40", "A"))],
    ]
    src = str(tmp_path / "src_ttl")
    for rows in batches:
        df = spark.createDataFrame(rows, "doc_id string, raw string")
        df.select(
            "doc_id",
            tokenize_pandas(F.col("raw")).alias("tokens"),
            F.length("raw").cast("int").alias("n_tok"),
            F.lit("snoopy").alias("source"),
        ).coalesce(1).write.mode("append").parquet(src)
        _time.sleep(0.2)  # distinct mtimes: the file source triggers in order

    out = str(tmp_path / "ddb")
    q = streaming.streaming_dedup_bounded(
        spark, src, out, ttl_seconds=3600, watermark="1 second", max_files=1
    )
    q.awaitTermination(300)

    rows = spark.read.parquet(os.path.join(out, "deduped")).collect()
    by_doc = {r["doc_id"]: r for r in rows}
    # batch 1: in-batch dup suppressed, min doc_id kept
    assert "a0" in by_doc and by_doc["a0"]["n_batch_dups"] == 1
    assert "a1" not in by_doc
    # post-expiry occurrence re-admitted with the SAME fingerprint
    assert "a2" in by_doc
    assert by_doc["a2"]["fingerprint"] == by_doc["a0"]["fingerprint"]
    assert {r["doc_id"] for r in rows} == {"a0", "b1", "c1", "d1", "a2"}

    # state store shrank when A and B timed out
    progress = [p for p in q.recentProgress if p.get("stateOperators")]
    totals = [p["stateOperators"][0]["numRowsTotal"] for p in progress]
    removed = sum(p["stateOperators"][0]["numRowsRemoved"] for p in progress)
    assert removed >= 2
    assert any(b < a for a, b in zip(totals, totals[1:])), totals


def test_streaming_dedup_suppresses_across_microbatches(spark, tmp_path):
    """Duplicates must be suppressed within a micro-batch AND across
    micro-batches (the custom state part built-ins cannot express:
    keeping the kept row's payload + a running duplicate count)."""
    from hnormalise_spark.tokenizer import tokenize_pandas

    src = str(tmp_path / "src")
    # 3 single-row-group files -> with max_files=1, 3 micro-batches.
    # 'alpha beta' appears in batches 1 and 3 (cross-batch dup) and
    # twice in batch 1 (in-batch dup); 'gamma' only in batch 2.
    batches = [
        [("d1", "alpha beta"), ("d0", "alpha beta"), ("d2", "unique one")],
        [("d3", "gamma delta")],
        [("d4", "alpha beta"), ("d5", "gamma delta")],
    ]
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "doc_id string, raw string")
        df.select(
            "doc_id",
            tokenize_pandas(F.col("raw")).alias("tokens"),
            F.lit(2).alias("n_tok"),
            F.lit("test").alias("source"),
        ).coalesce(1).write.mode("append").parquet(src)

    out = str(tmp_path / "dd")
    q = streaming.streaming_dedup(spark, src, out, max_files=1)
    q.awaitTermination(300)

    got = {
        r["raw"]: (r["doc_id"], r["n_batch_dups"])
        for r in spark.read.parquet(os.path.join(out, "deduped")).collect()
    }
    # each distinct text emitted exactly once, min doc_id of its first
    # batch kept, in-batch duplicate counted; later batches suppressed
    assert set(got) == {"alpha beta", "unique one", "gamma delta"}
    kept_alpha = got["alpha beta"]
    assert kept_alpha[0] == "d0" and kept_alpha[1] == 1
    assert got["unique one"] == ("d2", 0)
    assert got["gamma delta"][1] == 0


def test_streaming_dedup_indexed_durable_cross_batch(spark, tmp_path):
    """Stream dedup through the DURABLE fingerprint index: history
    dups suppressed, in-batch dups collapsed, a batch-2 repeat of a
    batch-1 novel row is caught via the index snapshot batch 1
    committed (no state store involved), and the index grows by
    exactly the novel fingerprints."""
    import os
    import time as _time

    from hnormalise_spark import streaming, table
    from hnormalise_spark.ops.dedup import build_fingerprint_index

    idx = str(tmp_path / "fpidx")
    hist = spark.createDataFrame(
        [("h1", "old doc one"), ("h2", "old doc two")],
        "doc_id string, text string",
    )
    build_fingerprint_index(hist, idx)
    base_n = table.read_committed(spark, idx).count()

    src = str(tmp_path / "src")
    batches = [
        # dup-of-history (normalization-insensitive), novel A (+in-batch dup)
        [("n1", "  OLD   doc one "), ("n2", "fresh alpha"), ("n3", "fresh  ALPHA")],
        # cross-batch dup of A (via the index!), novel B
        [("n4", "fresh alpha"), ("n5", "fresh beta")],
    ]
    for rows in batches:
        spark.createDataFrame(rows, "doc_id string, text string").coalesce(
            1
        ).write.mode("append").parquet(src)
        _time.sleep(0.2)

    out = str(tmp_path / "out")
    q = streaming.streaming_dedup_indexed(spark, src, out, idx, max_files=1)
    q.awaitTermination(300)

    got = spark.read.parquet(os.path.join(out, "deduped")).collect()
    by_doc = {r["doc_id"]: r for r in got}
    # only the two genuinely novel docs came through
    assert set(by_doc) == {"n2", "n5"}
    assert by_doc["n2"]["n_batch_dups"] == 1  # n3 collapsed in-batch
    assert by_doc["n5"]["n_batch_dups"] == 0
    # the index grew by exactly the two novel fingerprints
    assert table.read_committed(spark, idx).count() == base_n + 2

    # replaying the same input against the SAME index emits nothing
    out2 = str(tmp_path / "out2")
    q2 = streaming.streaming_dedup_indexed(spark, src, out2, idx, max_files=1)
    q2.awaitTermination(300)
    rep = spark.read.parquet(os.path.join(out2, "deduped"))
    assert rep.count() == 0
    assert table.read_committed(spark, idx).count() == base_n + 2


def test_failure_rate_alerts_fire_per_window_and_source(spark, tmp_path):
    """Alert stream: a window/source whose failure fraction exceeds the
    threshold emits ONE alert row when its window closes; healthy
    windows and low-volume windows stay silent; the still-open final
    window is withheld."""
    from hnormalise_spark.tokenizer import retokenize_col

    def _snoopy(hhmmss, i):
        return (
            f"<13>1 2017-05-24T{hhmmss}+00:00 h snoopy[{i}]: - snoopy[{i}]::  "
            f"[uid:1 sid:1 tty:(none) cwd:/ filename:/bin/x]: /bin/x"
        )

    def _junk(hhmmss, i):
        # valid envelope (so timereported exists) with a garbage payload
        return f"<13>1 2017-05-24T{hhmmss}+00:00 h weird[{i}]: - not parseable {i}"

    rows = []
    # window 10:00: 12 lines, 4 junk -> 33% > 20% -> ALERT
    rows += [(f"a{i}", _snoopy("10:00:05", i)) for i in range(8)]
    rows += [(f"aj{i}", _junk("10:00:06", i)) for i in range(4)]
    # window 10:05: 12 lines, 1 junk -> 8% -> silent
    rows += [(f"b{i}", _snoopy("10:05:05", i)) for i in range(11)]
    rows += [("bj0", _junk("10:05:06", 0))]
    # window 10:10: 5 lines all junk -> under min_lines -> silent
    rows += [(f"cj{i}", _junk("10:10:05", i)) for i in range(5)]
    # window 11:00: watermark pusher (still open -> withheld)
    rows += [(f"d{i}", _snoopy("11:00:05", i)) for i in range(2)]

    src = str(tmp_path / "src")
    spark.createDataFrame(rows, "doc_id string, raw string").select(
        "doc_id",
        retokenize_col("raw").alias("tokens"),
        F.length("raw").cast("int").alias("n_tok"),
        F.lit("mixed").alias("source"),
    ).write.parquet(src)

    out = str(tmp_path / "alerts")
    q = streaming.failure_rate_alerts(
        spark, src, out, window="1 minute", watermark="10 minutes",
        threshold=0.2, min_lines=10,
    )
    q.awaitTermination(300)

    alerts = spark.read.parquet(os.path.join(out, "alerts")).collect()
    assert len(alerts) == 1
    a = alerts[0]
    assert a["window"]["start"].minute == 0 and a["window"]["start"].hour == 10
    assert a["n_lines"] == 12 and a["n_fail"] == 4
    assert a["fail_rate_x1e6"] == 333333
