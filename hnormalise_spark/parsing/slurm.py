"""Slurm accounting-record parser as Spark Column expressions.

The reference's north star names "Slurm accounting" alongside its
Torque parsers, but hnormalise itself only understands Slurm job ids
inside lmod records (/root/reference/src/HNormalise/Lmod/Parser.hs:54-67
— the LmodSlurmJobId branch). This module supplies the missing family:
the public ``jobcomp/filetxt`` completion-record format Slurm's
jobcomp plugin writes (documented in the Slurm jobcomp.html man page),
one space-separated ``Key=Value`` record per finished job::

    slurmctld: JobId=1234 UserId=alice(1000) GroupId=grp(2000)
    Name=train JobState=COMPLETED Partition=gpu TimeLimit=60
    StartTime=2024-01-01T10:00:00 EndTime=2024-01-01T10:30:00
    NodeList=node[001-004] NodeCnt=4 ProcCnt=64 WorkDir=/home/alice

Design notes (all vectorized JVM expressions, zero per-row Python):

* The body parse reuses the order-insensitive KV machinery built for
  torque (common.kv_map — one str_to_map per row), so key order never
  matters, exactly like the torque accounting fallback path.
* ``JobState=CANCELLED by <uid>`` (the one value filetxt writes with a
  space) is pre-normalised to ``JobState=CANCELLED CancelledBy=<uid>``
  with a single regexp_replace so the KV split stays trivially
  one-token-per-pair.
* ``TimeLimit`` is minutes or the literal ``UNLIMITED`` (null minutes,
  unlimited records still parse).
* ``NodeList`` is Slurm's compressed hostlist syntax —
  ``node[001-004,007]``, comma-joined groups, plain names, or
  ``(null)`` for jobs that never started — expanded to the full
  hostname array by ``slurm_hostlist`` (the Slurm twin of torque's
  exec_host core-range expansion, common.host_list). Zero padding
  follows Slurm: each number pads to the width of the range's low
  bound.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from hnormalise_spark.parsing import common as C
from hnormalise_spark.schemas import SLURM_PAYLOAD

PREFIX = "slurmctld: "

# jobcomp/filetxt job states (slurm.conf man page, JobCompType section).
JOB_STATES = [
    "BOOT_FAIL", "CANCELLED", "COMPLETED", "DEADLINE", "FAILED",
    "NODE_FAIL", "OUT_OF_MEMORY", "PREEMPTED", "REQUEUED", "REVOKED",
    "TIMEOUT",
]

RE_ISO_TS = r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}$"
RE_USER_GROUP = r"^([^()\s]+)\((\d+)\)$"  # name(uid)
# hostlist: plain names / bracket groups / (null); commas both between
# groups and inside brackets
RE_HOSTLIST = r"^(?:\(null\)|[A-Za-z0-9_.-]*(?:\[[0-9,-]+\])?[A-Za-z0-9_.-]*(?:,[A-Za-z0-9_.-]*(?:\[[0-9,-]+\])?[A-Za-z0-9_.-]*)*)$"
# split top-level commas only: a comma INSIDE brackets sees a ']'
# before any '[' ahead of it
RE_TOP_COMMA = r",(?![^\[]*\])"


def slurm_hostlist(s: Column) -> Column:
    """Compressed Slurm hostlist → array<string> of full hostnames.

    ``node[001-004,007]`` → [node001..node004, node007];
    ``a,b[1-2]c`` → [a, b1c, b2c]; ``(null)``/'' → []. Numbers pad to
    the width of each range's LOW bound (Slurm semantics). All-HOF
    expansion — interpreted eval, so the per-element work is one split
    + one sequence; no regex inside the lambdas."""

    def pad_to(num: Column, width: Column) -> Column:
        txt = num.cast("string")
        return F.concat(
            F.repeat(F.lit("0"), F.greatest(width - F.length(txt), F.lit(0))), txt
        )

    def expand_specs(specs: Column) -> Column:
        def piece(p: Column) -> Column:
            d = F.split(p, "-")
            lo_s = F.element_at(d, 1)
            hi = F.element_at(d, -1).cast("int")
            return C.let(
                lo_s,
                lambda lo: F.transform(
                    F.sequence(lo.cast("int"), hi),
                    lambda n: pad_to(n, F.length(lo)),
                ),
            )

        return F.flatten(F.transform(F.split(specs, ","), piece))

    def elem(e: Column) -> Column:
        # prefix[specs]suffix | plain-name
        has_br = e.contains("[")
        pre = F.substring_index(e, "[", 1)
        inner = F.substring_index(F.substring_index(e, "[", -1), "]", 1)
        suf = F.substring_index(e, "]", -1)
        expanded = F.transform(
            expand_specs(inner), lambda n: F.concat(pre, n, suf)
        )
        return F.when(has_br, expanded).otherwise(F.array(e))

    empty = F.array().cast("array<string>")
    joined = F.flatten(F.transform(F.split(s, RE_TOP_COMMA), elem))
    return (
        F.when((s == "") | (s == "(null)"), empty)
        .when(s.rlike(RE_HOSTLIST), joined)
    )


def layers(gate: Column, msg: Column) -> list[dict[str, Column]]:
    body = F.substring(msg, len(PREFIX) + 1, 1 << 30)
    # the one space-containing value → its own key, pre-KV
    body = F.regexp_replace(
        body, r"JobState=CANCELLED by (\d+)", r"JobState=CANCELLED CancelledBy=$1"
    )
    layer1 = {"_su_kv": F.when(gate, C.kv_map(body))}

    kv = F.col("_su_kv")

    def v(key: str) -> Column:
        return C.kv_get(kv, key)

    layer2 = {
        "_su_user_a": C.packed_groups(v("UserId"), RE_USER_GROUP, 2),
        "_su_group_a": C.packed_groups(v("GroupId"), RE_USER_GROUP, 2),
        "_su_nodes": slurm_hostlist(v("NodeList")),
        "_su_start": F.when(
            F.coalesce(v("StartTime").rlike(RE_ISO_TS), F.lit(False)),
            v("StartTime").try_cast("timestamp"),
        ),
        "_su_end": F.when(
            F.coalesce(v("EndTime").rlike(RE_ISO_TS), F.lit(False)),
            v("EndTime").try_cast("timestamp"),
        ),
    }

    unsigned_ok = lambda key: F.coalesce(v(key).rlike(r"^\d+$"), F.lit(False))  # noqa: E731
    state_ok = F.coalesce(v("JobState").isin(JOB_STATES), F.lit(False))
    tl_ok = F.coalesce(v("TimeLimit").rlike(r"^(\d+|UNLIMITED)$"), F.lit(False))
    cancel_ok = (
        ~F.coalesce(F.map_contains_key(kv, F.lit("CancelledBy")), F.lit(False))
        | (F.coalesce(v("JobState") == "CANCELLED", F.lit(False)))
    )
    layer3 = {
        "_su_ok": (
            unsigned_ok("JobId")
            & C.packed_ok(F.col("_su_user_a"), 2)
            & C.packed_ok(F.col("_su_group_a"), 2)
            & C.kv_has(kv, "Name")
            & state_ok
            & cancel_ok
            & C.kv_has(kv, "Partition")
            & tl_ok
            & F.col("_su_start").isNotNull()
            & F.col("_su_end").isNotNull()
            & F.col("_su_nodes").isNotNull()
            & unsigned_ok("NodeCnt")
            & unsigned_ok("ProcCnt")
        )
    }
    return [layer1, layer2, layer3]


def result() -> tuple[Column, Column, Column]:
    ok = F.col("_su_ok")
    kv = F.col("_su_kv")

    def v(key: str) -> Column:
        return C.kv_get(kv, key)

    def ga(col: str, i: int) -> Column:
        return F.element_at(F.col(col), i)

    start, end = F.col("_su_start"), F.col("_su_end")
    payload = F.struct(
        v("JobId").cast("long").alias("job_id"),
        ga("_su_user_a", 1).alias("user"),
        ga("_su_user_a", 2).cast("long").alias("uid"),
        ga("_su_group_a", 1).alias("group"),
        ga("_su_group_a", 2).cast("long").alias("gid"),
        v("Name").alias("job_name"),
        v("JobState").alias("job_state"),
        v("CancelledBy").try_cast("long").alias("cancelled_by"),
        v("Partition").alias("partition"),
        F.when(v("TimeLimit") != "UNLIMITED", v("TimeLimit"))
        .try_cast("long")
        .alias("time_limit_minutes"),
        start.alias("start_time"),
        end.alias("end_time"),
        (F.unix_timestamp(end) - F.unix_timestamp(start)).alias("duration_seconds"),
        F.col("_su_nodes").alias("node_list"),
        v("NodeCnt").cast("long").alias("node_cnt"),
        v("ProcCnt").cast("long").alias("proc_cnt"),
        v("WorkDir").alias("work_dir"),
    )
    payload = F.when(ok, payload).otherwise(F.lit(None).cast(SLURM_PAYLOAD))
    return payload, F.when(ok, F.lit("slurm_accounting")), ok


INTERMEDIATE_COLS = [
    "_su_kv", "_su_user_a", "_su_group_a", "_su_nodes", "_su_start",
    "_su_end", "_su_ok",
]
