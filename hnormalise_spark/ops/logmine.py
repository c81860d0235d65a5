"""Log template mining and burst detection — the "what do the
unparsed lines look like" companion to the dispatch pipeline.

hnormalise's operating model (src/HNormalise/Parser.hs:66-78) is a
FIXED parser list: a line either matches one of the known families or
falls out on the failure sink. What an operator does next, in
practice, is stare at the failure stream and write the next parser.
``mine_templates`` automates that triage at corpus scale: it masks the
variable fields of each raw line (IPv4, hex literals, decimal runs)
into typed wildcards and aggregates identical skeletons, so a billion
unparsed lines collapse into a few hundred candidate templates ranked
by volume — the same idea as Drain / LogMine template extraction, but
expressed as pure Catalyst expressions (regexp chain + one hash
aggregate) rather than a driver-side prefix tree.

Scale shape (100 TB): the masking chain is per-row JVM regex inside
whole-stage codegen (no Python, no UDF); the only shuffle carries the
SHORT template string + partial counts, and the hash aggregate
combines map-side, so shuffle volume is bounded by the number of
distinct templates per partition (~10^2-10^4), not by input rows.
Template count grows with message diversity, not data size — the
aggregate output is KB-scale even when the input is TB-scale.

``error_burst`` is the alerting-side analogue: bucket an event stream
per (entity, hour) and flag buckets whose count exceeds a multiple of
the entity's own mean rate — all in exact integer arithmetic
(cnt * n_buckets > k * total) so the decision is reproducible
cross-engine with no float tolerance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Masking rules, applied in order (most specific first so an IPv4
# octet is not eaten digit-wise by the number rule). Each pattern is
# deliberately inside the common subset of Java regex (Spark) and RE2
# (DuckDB): character classes, bounded quantifiers, no backrefs, no
# lookaround — the oracle replays the same chain bit-for-bit.
MASK_RULES: tuple[tuple[str, str], ...] = (
    # IPv4 dotted quad (bounded octets, word-ish boundaries via class)
    (r"(?:[0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
    # hex literals (0x-prefixed)
    (r"0x[0-9a-fA-F]+", "<HEX>"),
    # decimal runs (after IP/hex so their digits are already gone)
    (r"[0-9]+", "<N>"),
)


def mask_line(col: Column) -> Column:
    """Collapse variable fields of a raw log line into typed
    wildcards. Pure expression chain — stays inside whole-stage
    codegen; NULL propagates (a NULL raw line yields a NULL
    template, which ``mine_templates`` buckets separately)."""
    out = col
    for pat, repl in MASK_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def mine_templates(df: DataFrame, raw_col: str = "raw") -> DataFrame:
    """Aggregate raw lines into (template, n_lines, share_ppm).

    One map-side-combining hash aggregate on the masked template
    string; the corpus-total for the share is a scalar window over the
    already-collapsed template table (hundreds of rows), NOT a second
    pass over the input. share_ppm is integer micro-units
    (floor(n * 1e6 / total + 0.5)) so the result hashes identically
    cross-engine. Deterministic order keys (n_lines DESC, template
    ASC) are the caller's to apply; rows here are unordered.
    """
    tpl = df.select(mask_line(F.col(raw_col)).alias("template"))
    counts = tpl.groupBy("template").agg(F.count(F.lit(1)).alias("n_lines"))
    # total = sum over the tiny aggregated table; an unpartitioned
    # window here is over ~#templates rows, not input rows.
    from pyspark.sql import Window

    total = F.sum("n_lines").over(Window.partitionBy())
    return counts.select(
        "template",
        F.col("n_lines").cast("long").alias("n_lines"),
        F.floor(F.col("n_lines") * F.lit(1_000_000) / total + F.lit(0.5))
        .cast("long")
        .alias("share_ppm"),
    )


def template_drift(
    old: DataFrame, new: DataFrame, raw_col: str = "raw"
) -> DataFrame:
    """Compare template populations between two corpora (e.g. last
    week's failure stream vs today's): full outer join of the two
    mined tables on template, with per-side counts and a status
    column — 'new' (only in new), 'gone' (only in old), 'shifted'
    (share moved by >2x in either direction), 'stable'.

    Both inputs collapse to template-cardinality tables BEFORE the
    join, so the join is tiny regardless of input scale; at 100 TB a
    broadcast is safe on either side but left to AQE since both sides
    are KB-scale post-aggregate.
    """
    o = mine_templates(old, raw_col).select(
        "template",
        F.col("n_lines").alias("n_old"),
        F.col("share_ppm").alias("share_old_ppm"),
    )
    n = mine_templates(new, raw_col).select(
        "template",
        F.col("n_lines").alias("n_new"),
        F.col("share_ppm").alias("share_new_ppm"),
    )
    j = o.join(n, "template", "full_outer").select(
        "template",
        F.coalesce("n_old", F.lit(0)).cast("long").alias("n_old"),
        F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
        F.coalesce("share_old_ppm", F.lit(0)).cast("long").alias("share_old_ppm"),
        F.coalesce("share_new_ppm", F.lit(0)).cast("long").alias("share_new_ppm"),
    )
    # integer 2x-share test: new*1 > old*2 (or vice versa), on ppm
    status = (
        F.when(F.col("n_old") == 0, F.lit("new"))
        .when(F.col("n_new") == 0, F.lit("gone"))
        .when(
            (F.col("share_new_ppm") > 2 * F.col("share_old_ppm"))
            | (F.col("share_old_ppm") > 2 * F.col("share_new_ppm")),
            F.lit("shifted"),
        )
        .otherwise(F.lit("stable"))
    )
    return j.withColumn("status", status)


def error_burst(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    bucket: str = "hour",
    threshold_num: int = 3,
    threshold_den: int = 1,
) -> DataFrame:
    """Flag (entity, time-bucket) pairs whose event count exceeds
    (threshold_num/threshold_den) x the entity's own mean bucket rate.

    Exact integer decision: a bucket fires iff
        cnt * n_buckets * threshold_den > threshold_num * total
    where n_buckets / total are the entity's OWN observed bucket count
    and event total — no floats, no global state, reproducible
    cross-engine.

    Scale shape: one hash aggregate to (entity, bucket) — map-side
    combining collapses each input partition to its local rollup — then
    a window partitioned by entity over the ROLLUP (|entities| x
    |buckets| rows, ~10^-4 of event rows at log scale). The second
    exchange therefore moves the rollup, never the raw events. Skewed
    entities (one service account emitting most of the log) cost one
    hot window partition of |buckets| rows — bounded by the time
    range, not by event volume.
    """
    from pyspark.sql import Window

    b = F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts")
    rollup = events.groupBy(F.col(entity_col).alias("entity"), b).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w = Window.partitionBy("entity")
    enriched = rollup.select(
        "entity",
        "bucket_ts",
        "n_events",
        F.sum("n_events").over(w).alias("_total"),
        F.count(F.lit(1)).over(w).alias("_n_buckets"),
    )
    fired = enriched.where(
        F.col("n_events") * F.col("_n_buckets") * F.lit(threshold_den)
        > F.lit(threshold_num) * F.col("_total")
    )
    return fired.select(
        F.col("entity").cast("long").alias("entity"),
        "bucket_ts",
        F.col("n_events").cast("long").alias("n_events"),
        # burst ratio in micro-units vs the entity mean, integer-exact:
        # floor(cnt * n_buckets * 1e6 / total + 0.5)
        F.floor(
            F.col("n_events") * F.col("_n_buckets") * F.lit(1_000_000)
            / F.col("_total")
            + F.lit(0.5)
        )
        .cast("long")
        .alias("ratio_ppm"),
    )
