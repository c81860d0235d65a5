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
