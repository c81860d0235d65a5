"""Lmod message parser as Spark Column expressions.

Re-expression of /root/reference/src/HNormalise/Lmod/Parser.hs:
``lmod:: username=U, cluster=C, jobid=[J], <load|command tail>``.
Load (:89-101) is tried before command (:103-113), preserving the
dispatch order of Parser.hs:69-70.

The jobid is a sum (Lmod/Internal.hs:56-61): a torque-style job name
(sep ','; tried first, :54-67) or a bare slurm integer; an empty value
is Nothing (maybeOption, test/HNormalise/Lmod/ParserSpec.hs:76-90). A
non-empty value matching neither fails the whole line (the reference's
``char ','`` after the jobid would fail).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from hnormalise_spark.parsing import common as C
from hnormalise_spark.schemas import LMOD_PAYLOAD

_INFO = r"^lmod::\s*username=([^,]*),\s*cluster=([^,]*),\s*jobid=([^,]*),"
RE_LOAD = _INFO + r"\s*userload=((?i:yes|no)),\s*module=([^/]*)/([^,]*),\s*fn=(\S*)"
RE_COMMAND = _INFO + r"\s*cmd=([^,]*),\s*args=(\S*)"


def _jobid(raw: Column) -> tuple[Column, Column]:
    """jobid raw text → (LMOD_JOB_ID struct, valid)."""
    torque_name = C.job_name_struct(raw)
    is_torque = C.job_name_valid(raw)
    is_slurm = raw.rlike(r"^\d+$")
    struct = F.when(
        is_torque,
        F.struct(F.lit(None).cast("long").alias("number"), torque_name.alias("torque")),
    ).when(
        is_slurm,
        F.struct(
            raw.cast("long").alias("number"),
            F.lit(None).cast(
                "struct<number:long,array_id:long,master:string,cluster:string>"
            ).alias("torque"),
        ),
    )
    valid = (raw == "") | is_torque | is_slurm
    return struct, valid


def parse_lmod(msg: Column) -> tuple[Column, Column, Column]:
    """msg → (LMOD_PAYLOAD struct, parser name, parse_ok).

    Caller gates on ``msg.startswith('lmod::')``.
    """
    is_load = msg.rlike(RE_LOAD)
    is_cmd = ~is_load & msg.rlike(RE_COMMAND)

    def gl(i: int) -> Column:
        return F.regexp_extract(msg, RE_LOAD, i)

    def gc(i: int) -> Column:
        return F.regexp_extract(msg, RE_COMMAND, i)

    def info_of(g) -> Column:
        jobid_struct, _ = _jobid(g(3))
        return F.struct(
            g(1).alias("username"),
            g(2).alias("cluster"),
            jobid_struct.alias("jobid"),
        )

    _, jobid_valid_load = _jobid(gl(3))
    _, jobid_valid_cmd = _jobid(gc(3))
    jobid_valid = F.when(is_load, jobid_valid_load).otherwise(jobid_valid_cmd)

    load_payload = F.struct(
        F.lit("load").alias("event"),
        info_of(gl).alias("info"),
        (F.lower(gl(4)) == "yes").alias("userload"),
        F.struct(gl(5).alias("name"), gl(6).alias("version")).alias("module"),
        gl(7).alias("filename"),
        F.lit(None).cast("string").alias("command"),
        F.lit(None).cast("string").alias("arguments"),
    )
    cmd_payload = F.struct(
        F.lit("command").alias("event"),
        info_of(gc).alias("info"),
        F.lit(None).cast("boolean").alias("userload"),
        F.lit(None).cast("struct<name:string,version:string>").alias("module"),
        F.lit(None).cast("string").alias("filename"),
        gc(4).alias("command"),
        gc(5).alias("arguments"),
    )

    ok = (is_load | is_cmd) & jobid_valid
    payload = (
        F.when(ok & is_load, load_payload)
        .when(ok & is_cmd, cmd_payload)
        .otherwise(F.lit(None).cast(LMOD_PAYLOAD))
    )
    parser = F.when(ok & is_load, F.lit("lmod_load")).when(
        ok & is_cmd, F.lit("lmod_command")
    )
    return payload, parser, ok
