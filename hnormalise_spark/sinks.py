"""Sinks: the success/failure fan-out + counts, batch and staged.

The reference pushes each record to a success or failure socket and
keeps running counters (src/HNormalise/Util.hs:74-98). At Spark scale
the equivalent contract is: two routed tables whose row sets partition
the input, plus a counts table — all derived from ONE parse pass.

Scale design (SURVEY §4b): the parsed result is written once to a
*staging* table; the success/failure/counts sinks are then cheap
filtered scans of staging with parquet predicate pushdown on
``parse_ok`` (the fan-out never re-parses). The staging write doubles
as the checkpoint: re-running any sink is idempotent, and a resumed
job skips straight to the unfinished sink (run.py).

Success rows keep the typed payload structs and (optionally) the
reference-shaped JSON line; failure rows carry the ORIGINAL input
untouched (HNormalise.hs:69-73) — token-array equality is preserved
because we never rewrite `tokens`/`raw`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hnormalise_spark import jsonout
from hnormalise_spark.pipeline import counts as _counts

SUCCESS_COLS = [
    "doc_id", "source", "pri", "version", "timereported", "timereported_raw",
    "hostname", "syslogtag", "msg", "appname", "parser", "jsonkey",
    "torque", "lmod", "shorewall", "snoopy",
]


def with_lineage(df: DataFrame) -> DataFrame:
    """Per-partition lineage stamps (north_rule): partition id +
    input file, so every output row is traceable to its input split."""
    return df.withColumns(
        {
            "lineage_partition": F.spark_partition_id(),
            "lineage_file": F.input_file_name(),
        }
    )


def with_observed_metrics(parsed: DataFrame, name: str = "hnormalise_metrics") -> DataFrame:
    """Spark observed metrics — the increaseCount (Util.hs:93-98)
    equivalent: success/fail counters collected with the job, no extra
    pass. Read them from the QueryExecutionListener or, in streaming,
    from StreamingQueryProgress.observedMetrics."""
    return parsed.observe(
        name,
        F.count(F.lit(1)).alias("total"),
        F.count(F.when(F.col("parse_ok"), 1)).alias("success"),
        F.count(F.when(~F.col("parse_ok"), 1)).alias("fail"),
    )


def write_staging(parsed: DataFrame, path: str, json_line: bool = False, lean: bool = True) -> None:
    """One-pass write of the parsed result, partitioned by route so the
    success/failure scans are partition-pruned (not even a filter).

    ``lean`` keeps the original bytes (tokens/raw) only on FAILURE rows
    — the success contract never includes them, and at 10^12-row scale
    they are the bulk of the write volume (~90% of rows parse)."""
    out = with_lineage(parsed) if "lineage_partition" not in parsed.columns else parsed
    if json_line:
        out = out.withColumn(
            "json", F.when(F.col("parse_ok"), jsonout.encode_normalised())
        )
    if lean:
        for c in ("tokens", "raw", "n_tok"):
            if c in out.columns:
                out = out.withColumn(c, F.when(~F.col("parse_ok"), F.col(c)))
    if "tokens" not in out.columns and "raw" in out.columns:
        # token-path parse dropped the array for speed; reconstruct the
        # original bit-exactly for the failure contract (ASCII codec is
        # an exact inverse)
        from hnormalise_spark.tokenizer import retokenize_col

        out = out.withColumn(
            "tokens", F.when(~F.col("parse_ok"), retokenize_col("raw"))
        )
    # Partition directories by route so the sink scans are pruned; keep
    # parse_ok itself as a data column (partition values read back as
    # strings otherwise).
    out = out.withColumn(
        "route", F.when(F.col("parse_ok"), "success").otherwise("failure")
    )
    out.write.mode("overwrite").partitionBy("route").parquet(path)


def write_success(staging: DataFrame, path: str, json_line: bool = True) -> None:
    ok = staging.filter(F.col("parse_ok"))
    cols = [c for c in SUCCESS_COLS if c in staging.columns]
    if json_line:
        if "json" in staging.columns:
            cols.append("json")
        else:
            ok = ok.withColumn("json", jsonout.encode_normalised())
            cols.append("json")
    lineage = [c for c in ("lineage_partition", "lineage_file") if c in ok.columns]
    ok.select(*cols, *lineage).write.mode("overwrite").partitionBy().parquet(path)


def write_failure(staging: DataFrame, path: str, original_cols: tuple[str, ...] = ("doc_id", "source", "tokens", "n_tok", "raw")) -> None:
    cols = [c for c in original_cols if c in staging.columns]
    lineage = [c for c in ("lineage_partition", "lineage_file") if c in staging.columns]
    staging.filter(~F.col("parse_ok")).select(*cols, *lineage).write.mode(
        "overwrite"
    ).parquet(path)


def write_counts(staging: DataFrame, path: str) -> None:
    _counts(staging).write.mode("overwrite").parquet(path)


def write_debug(parsed: DataFrame, path: str) -> None:
    """S7 test/debug sink (mySink, Communication/File.hs:50-67): one
    text line per row — ``success: <json>`` for parsed rows,
    ``fail - original: <original line>`` for failures (the text writer
    supplies the trailing newline the conduit yields explicitly)."""
    original = F.col("raw") if "raw" in parsed.columns else F.col("msg")
    line = F.when(
        F.col("parse_ok"),
        F.concat(F.lit("success: "), jsonout.encode_normalised()),
    ).otherwise(F.concat(F.lit("fail - original: "), F.coalesce(original, F.lit(""))))
    parsed.select(line.alias("value")).write.mode("overwrite").text(path)


def run_batch(
    spark: SparkSession,
    parsed: DataFrame,
    out_dir: str,
    json_line: bool = True,
    export_sinks: bool = False,
    snapshot_id: str | None = None,
) -> dict[str, str]:
    """Staged fan-out: ONE parse pass writes the route-partitioned
    staging table; the success/failure sinks ARE its partitions
    (``staging/route=success|failure``) — no second write of the bulk
    data — and counts is a column-pruned aggregate scan of staging.

    Each step is idempotent (mode=overwrite), so a crashed run resumes
    by re-invoking: a finished staging write skips straight to counts.
    Set ``export_sinks`` to additionally materialize standalone
    success/failure tables (distinct locations/retention), paid as an
    extra read+write of staging.

    ``snapshot_id`` turns the whole fan-out into one snapshot-committed
    unit (table.py — Iceberg-style commit-then-visible): an id already
    in the manifest returns immediately with no work (resume after
    success); an id missing from the manifest re-runs everything and
    commits last, so a crash anywhere before the commit re-runs on the
    next invocation (resume after failure), overwriting partial output.
    """
    paths = {
        "staging": os.path.join(out_dir, "staging"),
        "success": os.path.join(out_dir, "staging", "route=success"),
        "failure": os.path.join(out_dir, "staging", "route=failure"),
        "counts": os.path.join(out_dir, "counts"),
    }
    if export_sinks:
        # resolve export locations up front so the resume early-return
        # below hands back the same dict shape as a fresh run
        paths["success"] = os.path.join(out_dir, "success")
        paths["failure"] = os.path.join(out_dir, "failure")
    if snapshot_id is not None:
        from hnormalise_spark import table as T

        if T.is_committed(out_dir, snapshot_id):
            return paths
    write_staging(parsed, paths["staging"], json_line=json_line)
    staging = spark.read.parquet(paths["staging"])
    write_counts(staging, paths["counts"])
    if export_sinks:
        write_failure(staging, paths["failure"])
        write_success(staging, paths["success"], json_line=json_line)
    if snapshot_id is not None:
        T._commit_manifest(
            out_dir, {"snapshot_id": snapshot_id, "paths": paths}
        )
    return paths
