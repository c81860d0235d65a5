"""ANSI-overflow hardening sweep: for EVERY family, a line whose
numeric field is wider than int64 (or wider than the multiplication
headroom) must fail its OWN row into the failure sink — the batch must
never abort on a cast/arithmetic overflow. (The reference parses into
unbounded Integer; our int64 schemas bound the gate regexes instead —
SURVEY §7 deviation.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from hnormalise_spark import fixtures as FX
from hnormalise_spark import pipeline as P

W20 = "9" * 20  # wider than int64
W12 = "9" * 12  # wider than the int casts (pri/pid/ports)

HOSTILE = [
    # (fixture id, hostile line)
    ("env-pri", FX.wrap("snoopy[1]::  [uid:1 sid:1 tty:t cwd:/ filename:/x]: x").replace("<133>", f"<{W12}>")),
    ("snoopy-pid", FX.wrap(f"snoopy[{W12}]::  [uid:1 sid:1 tty:t cwd:/ filename:/x]: x", tag="snoopy:")),
    ("snoopy-uid", FX.wrap(f"snoopy[1]::  [uid:{W12} sid:1 tty:t cwd:/ filename:/x]: x", tag="snoopy:")),
    ("shorewall-spt", FX.wrap(FX.SHOREWALL_TCP.replace("SPT=60048", f"SPT={W12}"), tag="kernel:")),
    ("lmod-jobid", FX.wrap(FX.LMOD_LOAD_SLURM.replace("jobid=3230905", f"jobid={W20}"), tag="lmod:")),
    ("torque-ctime", FX.wrap(FX.TORQUE_EXIT_FQDN.replace("ctime=1491390300", f"ctime={W20}"), tag="torque")),
    ("torque-jobid", FX.wrap(FX.TORQUE_EXIT_FQDN.replace(";E;45.", f";E;{W20}."), tag="torque")),
    ("torque-walltime", FX.wrap(FX.TORQUE_EXIT_FQDN.replace("Resource_List.walltime=01:00:00", "Resource_List.walltime=9999999999:00:00"), tag="torque")),
    ("torque-exit-status", FX.wrap(FX.TORQUE_EXIT_FQDN.replace("Exit_status=0", f"Exit_status=-{W20}"), tag="torque")),
    ("torque-core-range", FX.wrap(FX.TORQUE_EXIT_FQDN.replace("exec_host=node2801.somecluster.somedomain/0-1+node2803.somecluster.somedomain/0-1", "exec_host=node2801.somecluster.somedomain/0-99999999"), tag="torque")),
    ("slurm-jobid", FX.wrap(FX.SLURM_COMPLETED.replace("JobId=20746", f"JobId={W20}"), tag="slurmctld:")),
]


def test_hostile_numerics_fail_rows_never_the_batch(spark):
    df = spark.createDataFrame(
        [(fid, line) for fid, line in HOSTILE], "doc_id string, raw string"
    )
    rows = P.normalise(df).select("doc_id", "parse_ok").collect()  # must not raise
    bad = [r["doc_id"] for r in rows if r["parse_ok"]]
    assert not bad, f"hostile rows parsed ok: {bad}"
    assert len(rows) == len(HOSTILE)


def test_memory_overflow_nulls_field_only(spark):
    """An 18-digit byte count is representable, the same digits with a
    gb unit are not: the field nulls, nothing aborts."""
    from hnormalise_spark.parsing.common import memory_bytes

    df = spark.createDataFrame(
        [("b", "999999999999999999b"), ("gb", "999999999999999999gb"), ("k", "4kb")],
        "doc_id string, v string",
    )
    got = {
        r["doc_id"]: r["m"]
        for r in df.select("doc_id", memory_bytes(F.col("v")).alias("m")).collect()
    }
    assert got["b"] == 999999999999999999
    assert got["gb"] is None
    assert got["k"] == 4096


def test_boundary_widths_still_parse(spark):
    """Values at the documented bounds keep parsing (no off-by-one
    tightening): 18-digit epoch, 9-digit port, 4-digit core index."""
    line1 = FX.wrap(
        FX.TORQUE_EXIT_FQDN.replace("ctime=1491390300", "ctime=" + "9" * 18),
        tag="torque",
    )
    line2 = FX.wrap(FX.SHOREWALL_TCP.replace("SPT=60048", "SPT=999999999"), tag="kernel:")
    line3 = FX.wrap(
        FX.TORQUE_EXIT_FQDN.replace(
            "exec_host=node2801.somecluster.somedomain/0-1+node2803.somecluster.somedomain/0-1",
            "exec_host=node2801.somecluster.somedomain/9998-9999",
        ),
        tag="torque",
    )
    df = spark.createDataFrame(
        [("a", line1), ("b", line2), ("c", line3)], "doc_id string, raw string"
    )
    got = {r["doc_id"]: r["parse_ok"] for r in P.normalise(df).select("doc_id", "parse_ok").collect()}
    assert got == {"a": True, "b": True, "c": True}
