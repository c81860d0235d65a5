"""The normalisation pipeline: parse → route → aggregate.

Declarative DataFrame plan mirroring the reference's dataflow
(/root/reference/src/HNormalise.hs:89-98 + Util.hs:74-98):

    lines → envelope parse → ordered payload dispatch → typed structs
          → parse_ok routing (success/failure sinks) → counts

Dispatch (parseMessage, /root/reference/src/HNormalise/Parser.hs:66-78)
is first-match-wins over: lmod load, lmod command, shorewall
tcp/udp/icmp, snoopy, torque Q/S/D/E/A/R. Each family parser begins
with a distinct literal prefix (``lmod::``, ``kernel:: Shorewall:``,
``snoopy[``, ``torque: ``), so a cheap prefix gate picks the single
family whose (expensive) extraction expressions run for a row — the
vectorized equivalent of the reference's ordered alternatives, and the
README's suggested tag-based pre-routing (README.md:62-66) built in.

Everything is JVM whole-stage-codegen; no Python runs per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hnormalise_spark.parsing.envelope import parse_envelope
from hnormalise_spark.parsing.lmod import parse_lmod
from hnormalise_spark.parsing.shorewall import parse_shorewall
from hnormalise_spark.parsing.snoopy import parse_snoopy
from hnormalise_spark.parsing.torque import parse_torque
from hnormalise_spark.schemas import (
    LMOD_PAYLOAD,
    SHOREWALL_PAYLOAD,
    SNOOPY_PAYLOAD,
    TORQUE_PAYLOAD,
)
from hnormalise_spark.tokenizer import detokenize_col

# family → (prefix literal, appname, parse fn, payload schema); order =
# reference dispatch order (prefixes are mutually exclusive, so the
# when-cascade preserves first-match-wins exactly).
FAMILIES = [
    ("lmod", "lmod::", "lmod", parse_lmod, LMOD_PAYLOAD),
    ("shorewall", "kernel:: Shorewall:", "kernel", parse_shorewall, SHOREWALL_PAYLOAD),
    ("snoopy", "snoopy[", "snoopy", parse_snoopy, SNOOPY_PAYLOAD),
    ("torque", "torque: ", "torque", parse_torque, TORQUE_PAYLOAD),
]


def _family_col(msg: Column) -> Column:
    out = None
    for fam, prefix, _, _, _ in FAMILIES:
        cond = msg.startswith(prefix)
        out = F.when(cond, F.lit(fam)) if out is None else out.when(cond, F.lit(fam))
    return out


def normalise(df: DataFrame, line_col: str = "raw") -> DataFrame:
    """Parse a DataFrame of raw log lines into NORMALISED_SCHEMA shape.

    Keeps all pre-existing columns (doc_id, source, tokens, …) and adds
    envelope fields, one nullable payload struct per family, and the
    ``appname/parser/jsonkey/parse_ok`` routing columns.
    """
    # Trailing newline tolerance (the reference's line framing strips
    # it; parsers also tolerate it as unconsumed input, HNormalise.hs:94).
    line = F.regexp_replace(F.col(line_col), r"[\r\n]+$", "")

    env = parse_envelope(line)
    df = df.withColumns(
        {
            "pri": env["pri"],
            "version": env["version"],
            "timereported": env["timereported"],
            "timereported_raw": env["timereported_raw"],
            "hostname": env["hostname"],
            "syslogtag": env["syslogtag"],
            "msg": env["msg"],
            "_env_ok": env["env_ok"],
        }
    )

    msg = F.col("msg")
    fam = _family_col(msg)
    df = df.withColumn("_family", fam)

    payload_cols: dict[str, Column] = {}
    parser_col: Column = F.lit(None).cast("string")
    ok_col: Column = F.lit(False)
    app_col: Column = F.lit(None).cast("string")
    for fam_name, _, appname, parse_fn, schema in FAMILIES:
        gate = F.col("_family") == fam_name
        payload, parser, ok = parse_fn(msg)
        payload_cols[fam_name] = F.when(gate, payload).otherwise(
            F.lit(None).cast(schema)
        )
        parser_col = F.when(gate, parser).otherwise(parser_col)
        ok_col = F.when(gate, ok).otherwise(ok_col)
        app_col = F.when(gate, F.lit(appname)).otherwise(app_col)

    df = df.withColumns(
        {
            "appname": app_col,
            "parser": parser_col,
            "parse_ok": F.col("_env_ok") & F.coalesce(ok_col, F.lit(False)),
            **payload_cols,
        }
    )
    # appname/jsonkey are defined only for successfully parsed rows
    # (getJsonKey runs on the parse result, Parser.hs:82-88).
    df = df.withColumns(
        {
            "appname": F.when(F.col("parse_ok"), F.col("appname")),
            "jsonkey": F.when(F.col("parse_ok"), F.col("_family")),
            "parser": F.when(F.col("parse_ok"), F.col("parser")),
        }
    )
    return df.drop("_env_ok", "_family")


def normalise_tokens(df: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """Normalise a pre-tokenized input table (BASELINE.json input_hint).

    Detokenization is a JVM expression (codepoint → char), so the whole
    parse stays in one codegen stage.
    """
    return normalise(df.withColumn("raw", detokenize_col(tokens_col)), "raw")


# ---------------------------------------------------------------------------
# Routing (the success/failure fan-out, Util.hs:74-90)


def route_success(parsed: DataFrame) -> DataFrame:
    return parsed.filter(F.col("parse_ok"))


def route_failure(parsed: DataFrame, original_cols: list[str] | None = None) -> DataFrame:
    """Failure sink carries the *original* bytes/tokens untouched
    (Normalised = Original, HNormalise.hs:69-73)."""
    failed = parsed.filter(~F.col("parse_ok"))
    if original_cols:
        failed = failed.select(*original_cols)
    return failed


def counts(parsed: DataFrame, keys: tuple[str, ...] = ("source", "parser", "parse_ok")) -> DataFrame:
    """Per-(source, parser, success/failure) running counts — the
    generalisation of increaseCount (Util.hs:93-98) required by the
    north rule. A partial-aggregate (map-side combine) shuffle of a
    handful of groups; negligible at any scale."""
    cols = [k for k in keys if k in parsed.columns]
    return parsed.groupBy(*cols).agg(F.count(F.lit(1)).alias("n"))
