"""Slurm accounting family (parsing/slurm.py) — the north star's
"Slurm accounting" parser: hostlist expansion, order-insensitive KV
parse, state/limit edge cases, JSON encoder byte golden."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hnormalise_spark import jsonout
from hnormalise_spark import pipeline as P
from hnormalise_spark import fixtures as FX
from hnormalise_spark.parsing.slurm import slurm_hostlist


def _parse_one(spark, msg: str):
    df = spark.createDataFrame([("x", FX.wrap(msg, tag="slurmctld:"))], "doc_id string, raw string")
    return P.normalise(df).select("parse_ok", "parser", "slurm").collect()[0]


@pytest.mark.parametrize(
    ("expr", "want"),
    [
        ("node[001-004]", ["node001", "node002", "node003", "node004"]),
        ("node[001-003,007]", ["node001", "node002", "node003", "node007"]),
        ("node[8-11]", ["node8", "node9", "node10", "node11"]),  # pad = width of lo
        ("node[08-11]", ["node08", "node09", "node10", "node11"]),
        ("a,b", ["a", "b"]),
        ("gpu07", ["gpu07"]),
        ("a[1-2],b[5]", ["a1", "a2", "b5"]),
        ("rack[1-2]-n1", ["rack1-n1", "rack2-n1"]),  # suffix after bracket
        ("(null)", []),
        ("", []),
    ],
)
def test_hostlist_expansion(spark, expr, want):
    got = (
        spark.createDataFrame([(expr,)], "s string")
        .select(slurm_hostlist(F.col("s")).alias("h"))
        .collect()[0]["h"]
    )
    assert got == want, expr


def test_completed_golden(spark):
    r = _parse_one(spark, FX.SLURM_COMPLETED)
    assert r["parse_ok"] and r["parser"] == "slurm_accounting"
    s = r["slurm"]
    assert s["job_id"] == 20746 and s["uid"] == 1000 and s["user"] == "alice"
    assert s["job_state"] == "COMPLETED" and s["time_limit_minutes"] == 720
    assert s["duration_seconds"] == 3 * 3600 + 30 * 60 + 30
    assert s["node_list"] == ["node2801", "node2802", "node2803", "node2810"]
    assert s["node_cnt"] == 4 and s["proc_cnt"] == 128


def test_cancelled_by_and_unlimited(spark):
    s = _parse_one(spark, FX.SLURM_CANCELLED_BY)["slurm"]
    assert s["job_state"] == "CANCELLED" and s["cancelled_by"] == 1000
    assert s["time_limit_minutes"] is None  # UNLIMITED
    assert s["node_list"] == ["gpunode07", "cpunode01", "cpunode02"]


def test_never_started_null_nodelist(spark):
    s = _parse_one(spark, FX.SLURM_NODE_FAIL_NULL)["slurm"]
    assert s["node_list"] == [] and s["node_cnt"] == 0
    assert s["duration_seconds"] == 0


def test_key_order_insensitive(spark):
    """The KV parse accepts any key permutation (same guarantee the
    torque resource-request parse gives)."""
    shuffled = (
        "slurmctld: WorkDir=/scratch/alice/run1 NodeCnt=4 ProcCnt=128 "
        "NodeList=node[2801-2803,2810] EndTime=2024-03-01T11:45:30 "
        "StartTime=2024-03-01T08:15:00 TimeLimit=720 Partition=gpu "
        "JobState=COMPLETED Name=train_lm GroupId=astro(1000) "
        "UserId=alice(1000) JobId=20746"
    )
    a = _parse_one(spark, FX.SLURM_COMPLETED)["slurm"]
    b = _parse_one(spark, shuffled)["slurm"]
    assert a == b


@pytest.mark.parametrize(
    "bad",
    [
        FX.SLURM_BORKED,  # UserId without (uid)
        # unknown state
        FX.SLURM_COMPLETED.replace("JobState=COMPLETED", "JobState=DONE"),
        # CancelledBy forged on a non-CANCELLED record
        FX.SLURM_COMPLETED.replace("JobState=COMPLETED", "JobState=COMPLETED CancelledBy=1"),
        # malformed timestamp
        FX.SLURM_COMPLETED.replace("2024-03-01T08:15:00", "2024-03-01 08:15"),
        # missing required key
        FX.SLURM_COMPLETED.replace("Partition=gpu ", ""),
        # non-numeric time limit
        FX.SLURM_COMPLETED.replace("TimeLimit=720", "TimeLimit=12h"),
    ],
)
def test_failures_route_to_failure_sink(spark, bad):
    r = _parse_one(spark, bad)
    assert not r["parse_ok"] and r["slurm"] is None


SLURM_JSON_GOLDEN = (
    '{"jobId":20746,"user":"alice","uid":1000,"group":"astro","gid":1000,'
    '"name":"train_lm","jobState":"COMPLETED","cancelledBy":null,'
    '"partition":"gpu","timeLimitMinutes":720,'
    '"startTime":"2024-03-01T08:15:00","endTime":"2024-03-01T11:45:30",'
    '"durationSeconds":12630,'
    '"nodeList":["node2801","node2802","node2803","node2810"],'
    '"nodeCnt":4,"procCnt":128,"workDir":"/scratch/alice/run1"}'
)


def test_slurm_json_byte_golden(spark):
    df = spark.createDataFrame(
        [("x", FX.wrap(FX.SLURM_COMPLETED, tag="slurmctld:"))],
        "doc_id string, raw string",
    )
    got = P.normalise(df).select(jsonout.payload_json().alias("j")).collect()[0]["j"]
    assert got == SLURM_JSON_GOLDEN


# ---------------------------------------------------------------------------
# property-based: expansion matches a pure-Python reference on randomized
# well-formed hostlists (one Spark job for the whole batch of examples)


def _py_expand(expr: str) -> list[str]:
    import re as _re

    if expr in ("", "(null)"):
        return []
    out: list[str] = []
    for part in _re.split(r",(?![^\[]*\])", expr):
        m = _re.match(r"^([^\[]*)\[([0-9,-]+)\](.*)$", part)
        if not m:
            out.append(part)
            continue
        pre, specs, suf = m.groups()
        for spec in specs.split(","):
            lo, _, hi = spec.partition("-")
            hi = hi or lo
            for n in range(int(lo), int(hi) + 1):
                out.append(f"{pre}{str(n).zfill(len(lo))}{suf}")
    return out


def test_hostlist_property_random(spark):
    import random

    rng = random.Random(99)
    exprs = []
    for _ in range(150):
        groups = []
        for _ in range(rng.randrange(1, 4)):
            pre = rng.choice(["node", "gpu-", "c7n", "x"])
            if rng.random() < 0.3:
                groups.append(pre + str(rng.randrange(100)))
                continue
            specs = []
            for _ in range(rng.randrange(1, 4)):
                lo = rng.randrange(0, 300)
                width = rng.choice([0, 0, 2, 3])
                lo_s = str(lo).zfill(width)
                if rng.random() < 0.5:
                    specs.append(lo_s)
                else:
                    specs.append(f"{lo_s}-{lo + rng.randrange(0, 5)}")
            suf = rng.choice(["", "", "-ib"])
            groups.append(f"{pre}[{','.join(specs)}]{suf}")
        exprs.append(",".join(groups))
    exprs += ["", "(null)"]
    df = spark.createDataFrame([(e,) for e in exprs], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.select("s", slurm_hostlist(F.col("s")).alias("h")).collect()
    }
    for e in exprs:
        assert got[e] == _py_expand(e), e


# ---------------------------------------------------------------------------
# hardening regressions (code-review round): a malformed-but-plausible
# line must fail its OWN row — never abort the batch via an ANSI cast
# or a runaway expansion


@pytest.mark.parametrize(
    "expr",
    [
        "node[-5]",          # empty low bound
        "node[5-]",          # empty high bound
        "node[,5]",          # empty spec
        "node[99999999999]", # > int range (would abort cast('int'))
        "node[1-9999999]",   # > MAX_RANGE_WIDTH (would OOM)
    ],
)
def test_hostlist_malformed_yields_null_not_crash(spark, expr):
    got = (
        spark.createDataFrame([(expr,)], "s string")
        .select(slurm_hostlist(F.col("s")).alias("h"))
        .collect()[0]["h"]
    )
    assert got is None, expr


def test_hostlist_descending_range_contributes_nothing(spark):
    got = (
        spark.createDataFrame([("a[5-3],b2",)], "s string")
        .select(slurm_hostlist(F.col("s")).alias("h"))
        .collect()[0]["h"]
    )
    assert got == ["b2"]


@pytest.mark.parametrize(
    "bad",
    [
        # each passes the naive shape checks but would abort an ANSI
        # cast or blow memory if not range-gated; all must fail the row
        FX.SLURM_COMPLETED.replace("JobId=20746", "JobId=" + "9" * 20),
        FX.SLURM_COMPLETED.replace("(1000)", "(" + "9" * 20 + ")"),
        FX.SLURM_COMPLETED.replace("NodeCnt=4", "NodeCnt=" + "9" * 20),
        FX.SLURM_COMPLETED.replace(
            "NodeList=node[2801-2803,2810]", "NodeList=node[-5]"
        ),
        FX.SLURM_COMPLETED.replace(
            "NodeList=node[2801-2803,2810]", "NodeList=node[1-9999999]"
        ),
    ],
)
def test_hostile_numerics_fail_row_not_batch(spark, bad):
    r = _parse_one(spark, bad)
    assert not r["parse_ok"] and r["slurm"] is None


def test_hostlist_record_total_expansion_bounded(spark):
    """The OOM guard bounds the RECORD, not just each range: many
    comma-separated groups each under the per-range cap must still
    fail the row once their summed width crosses MAX_RANGE_WIDTH
    (round-4 advice)."""
    # 3 groups x 60000 each = 180k total, every individual range narrow
    expr = ",".join(f"g{i}[1-60000]" for i in range(3))
    got = (
        spark.createDataFrame([(expr,)], "s string")
        .select(slurm_hostlist(F.col("s")).alias("h"))
        .collect()[0]["h"]
    )
    assert got is None

    # but a record whose TOTAL is under the cap still expands fine
    ok = (
        spark.createDataFrame([("a[1-3],b[2-4]x,c",)], "s string")
        .select(slurm_hostlist(F.col("s")).alias("h"))
        .collect()[0]["h"]
    )
    assert ok == ["a1", "a2", "a3", "b2x", "b3x", "b4x", "c"]
