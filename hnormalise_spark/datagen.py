"""Deterministic synthetic corpus generator (Spark-native, scalable).

Builds the canonical input table (doc_id, tokens, n_tok, source) of
BASELINE.json ``input_hint`` at any row count as a pure expression
pipeline over ``spark.range`` — no driver-side loops, no Python RNG —
so the exact same generator runs at 10^3 rows in tests and 10^12 rows
on a cluster, and row *i* is identical everywhere (pseudo-randomness is
``xxhash64(id, seed)``).

Line shapes are parameterized clones of the reference's own test
fixtures (fixtures.py). The ``source`` distribution is intentionally
skewed torque-heavy (FIXTURES.md §1) to exercise skew handling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hnormalise_spark.tokenizer import tokenize_pandas

SEED = 42

# cumulative source mix out of 100: torque 55, lmod 15, shorewall 10,
# snoopy 12, junk 8 — torque-heavy skew.
_MIX = [("torque", 55), ("lmod", 70), ("shorewall", 80), ("snoopy", 92), ("junk", 100)]


def _h(i: int) -> Column:
    """Independent deterministic hash stream #i for the current row."""
    return F.abs(F.xxhash64(F.col("id"), F.lit(SEED), F.lit(i)))


def _source_col() -> Column:
    bucket = _h(0) % 100
    out = None
    for name, ceil in _MIX:
        cond = bucket < ceil
        out = F.when(cond, name) if out is None else out.when(cond, name)
    return out


def _envelope(msg: Column, tag: Column | str, pid_suffix: Column | None = None) -> Column:
    host = F.format_string("node%04d.c%d.example.org", _h(1) % 500, _h(1) % 500 % 7)
    ts = F.format_string(
        "2017-05-24T%02d:%02d:%02d.%06d+02:00",
        _h(2) % 24, _h(3) % 60, _h(4) % 60, _h(5) % 1000000,
    )
    pri = F.format_string("<%d>1", 1 + _h(6) % 190)
    tag_col = F.lit(tag) if isinstance(tag, str) else tag
    return F.concat_ws(" ", pri, ts, host, tag_col, F.lit("-"), msg)


def _torque_msg() -> Column:
    """Parameterized clones of the six accounting shapes."""
    n = F.col("id")
    kind = _h(10) % 20  # E:8, S:4, Q:4, D:2, A:1, R:1
    datestamp = F.format_string(
        "0%d/1%d/201%d %02d:%02d:%02d",
        _h(11) % 9 + 1, _h(12) % 9, _h(13) % 8, _h(14) % 24, _h(15) % 60, _h(16) % 60,
    )
    arr = F.when(_h(17) % 5 == 0, F.format_string("[%d]", _h(18) % 1000)).otherwise(F.lit(""))
    name = F.format_string("%d%s.master%d.cluster%d.example.org", n, arr, _h(19) % 20, _h(19) % 20 % 7)
    user = F.format_string("vsc4%04d", _h(20) % 2000)
    ctime = F.lit(1491390300) + (_h(21) % 864000)
    qtime = ctime + _h(22) % 600
    etime = qtime + _h(23) % 600
    start = etime + _h(24) % 600
    end = start + _h(25) % 86400
    nh = (_h(26) % 3 + 1).cast("int")          # hosts
    ppn = (_h(27) % 8 + 1).cast("int")          # cores per host
    exec_host = F.array_join(
        F.transform(
            F.sequence(F.lit(0), nh - 1),
            lambda j: F.format_string(
                "node%04d.cluster%d.example.org/%s",
                (_h(28) + j * 37) % 500,
                _h(19) % 20 % 7,
                F.when(ppn == 1, F.lit("0")).otherwise(
                    F.format_string("0-%d", ppn - 1)
                ),
            ),
        ),
        "+",
    )
    nodes = F.format_string("%d:ppn=%d", nh, ppn)
    vmem_gb = _h(29) % 16 + 1
    walltime = F.format_string("%02d:%02d:00", _h(30) % 72, _h(31) % 60)
    common = F.format_string(
        "user=%s group=%s jobname=job_%d queue=q%d ctime=%d qtime=%d etime=%d",
        user, user, n, _h(32) % 5, ctime, qtime, etime,
    )
    start_info = F.format_string(
        "start=%d owner=%s@submit%02d.example.org exec_host=%s "
        "Resource_List.neednodes=%s Resource_List.nice=0 Resource_List.nodect=%d "
        "Resource_List.nodes=%s Resource_List.vmem=%dgb Resource_List.walltime=%s",
        start, user, _h(33) % 4, exec_host, nodes, nh, nodes, F.lit(vmem_gb), walltime,
    )
    exit_extra = F.format_string(
        "session=%d total_execution_slots=%d unique_node_count=%d end=%d Exit_status=%d "
        "resources_used.cput=%02d:%02d:%02d resources_used.energy_used=0 "
        "resources_used.mem=%dkb resources_used.vmem=%dkb resources_used.walltime=%s",
        _h(34) % 100000, nh * ppn, nh, end, (_h(35) % 10).cast("long") - 3,
        _h(36) % 100, _h(37) % 60, _h(38) % 60,
        _h(39) % 10000000, _h(40) % 30000000, walltime,
    )
    return (
        F.when(kind < 8, F.format_string("torque: %s;E;%s;%s %s %s", datestamp, name, common, start_info, exit_extra))
        .when(kind < 12, F.format_string("torque: %s;S;%s;%s %s", datestamp, name, common, start_info))
        .when(kind < 16, F.format_string("torque: %s;Q;%s;queue=q%d", datestamp, name, _h(32) % 5))
        .when(kind < 18, F.format_string("torque: %s;D;%s;requestor=%s@submit%02d.example.org", datestamp, name, user, _h(33) % 4))
        .when(kind < 19, F.format_string("torque: %s;A;%s;", datestamp, name))
        .otherwise(F.format_string("torque: %s;R;%s;", datestamp, name))
    )


def _lmod_msg() -> Column:
    n = F.col("id")
    jobid_kind = _h(50) % 3
    jobid = (
        F.when(jobid_kind == 0, F.format_string("%d.master%d.cluster%d.example.org", n, _h(51) % 20, _h(51) % 20 % 7))
        .when(jobid_kind == 1, F.format_string("%d", _h(52) % 10000000))
        .otherwise(F.lit(""))
    )
    info = F.format_string(
        "username=vsc4%04d, cluster=cluster%d, jobid=%s", _h(53) % 2000, _h(51) % 20 % 7, jobid
    )
    load = F.format_string(
        "lmod::  %s, userload=%s, module=Mod%d/%d.%d-intel-2016b, fn=/apps/modules/all/Mod%d/%d.%d",
        info, F.when(_h(54) % 2 == 0, F.lit("yes")).otherwise(F.lit("no")),
        _h(55) % 100, _h(56) % 9, _h(57) % 9, _h(55) % 100, _h(56) % 9, _h(57) % 9,
    )
    cmd = F.format_string(
        "lmod::  %s, cmd=%s, args=cluster/c%d",
        info,
        F.when(_h(58) % 2 == 0, F.lit("load")).otherwise(F.lit("unload")),
        _h(59) % 7,
    )
    return F.when(_h(60) % 3 < 2, load).otherwise(cmd)


def _shorewall_msg() -> Column:
    proto = _h(70) % 3
    head = F.format_string(
        "kernel:: Shorewall:%s:%s:IN=em%d",
        F.when(_h(71) % 2 == 0, F.lit("ext2fw")).otherwise(F.lit("ipmi2int")),
        F.when(_h(72) % 3 == 0, F.lit("DROP")).otherwise(F.lit("REJECT")),
        _h(73) % 4 + 1,
    )
    src = F.format_string("%d.%d.%d.%d", _h(74) % 224, _h(75) % 256, _h(76) % 256, _h(77) % 255)
    dst = F.format_string("10.%d.%d.%d", _h(78) % 256, _h(79) % 256, _h(80) % 255)
    mid = F.format_string("LEN=%d TOS=0x00 PREC=0x00 TTL=%d ID=%d", _h(81) % 1400 + 28, _h(82) % 255 + 1, _h(83) % 65536)
    tcp = F.format_string(
        "%s OUT= MAC=aa:bb:cc:%02d:%02d:%02d SRC=%s DST=%s %s DF PROTO=TCP SPT=%d DPT=%d WINDOW=65535 RES=0x00 SYN URGP=0",
        head, _h(84) % 100, _h(85) % 100, _h(86) % 100, src, dst, mid, _h(87) % 64512 + 1024, _h(88) % 1024,
    )
    udp = F.format_string(
        "%s OUT=em%d SRC=%s DST=%s %s PROTO=UDP SPT=%d DPT=%d LEN=%d",
        head, _h(89) % 4 + 1, src, dst, mid, _h(87) % 64512 + 1024, _h(88) % 1024, _h(81) % 1400 + 8,
    )
    icmp = F.format_string(
        "%s OUT=em%d SRC=%s DST=%s %s PROTO=ICMP TYPE=8 CODE=0 ID=%d SEQ=%d",
        head, _h(89) % 4 + 1, src, dst, mid, _h(83) % 65536, _h(90) % 65536,
    )
    return F.when(proto == 0, tcp).when(proto == 1, udp).otherwise(icmp)


def _snoopy_msg() -> Column:
    pid = _h(100) % 65536
    username = F.when(
        _h(101) % 2 == 0, F.format_string(" username:user%03d", _h(102) % 500)
    ).otherwise(F.lit(""))
    return F.format_string(
        "snoopy[%d]::  [uid:%d%s sid:%d tty:%s cwd:%s filename:%s]: %s",
        pid,
        _h(103) % 65536,
        username,
        _h(104) % 65536,
        F.when(_h(105) % 4 == 0, F.lit("pts/1")).otherwise(F.lit("(none)")),
        F.format_string("/home/user%03d/work", _h(102) % 500),
        F.format_string("/usr/bin/tool%02d", _h(106) % 50),
        F.format_string("tool%02d --input data_%d.txt -n %d", _h(106) % 50, F.col("id"), _h(107) % 100),
    )


def _junk_msg() -> Column:
    kind = _h(110) % 4
    return (
        F.when(kind == 0, F.format_string("some random text %d that matches nothing", F.col("id")))
        .when(kind == 1, F.format_string("torque: 04/05/2017 13:06:53;E;%d.master", F.col("id")))  # truncated
        .when(kind == 2, F.format_string("sshd[%d]: Accepted publickey for root", _h(111) % 65536))
        .otherwise(F.lit(""))
    )


def raw_lines(spark: SparkSession, n_rows: int, partitions: int | None = None) -> DataFrame:
    """→ (doc_id, source, raw) at any scale, fully deterministic."""
    df = spark.range(0, n_rows, 1, partitions or spark.sparkContext.defaultParallelism)
    df = df.withColumn("source", _source_col())
    msg = (
        F.when(F.col("source") == "torque", _torque_msg())
        .when(F.col("source") == "lmod", _lmod_msg())
        .when(F.col("source") == "shorewall", _shorewall_msg())
        .when(F.col("source") == "snoopy", _snoopy_msg())
        .otherwise(_junk_msg())
    )
    tag = (
        F.when(F.col("source") == "torque", F.lit("torque"))
        .when(F.col("source") == "lmod", F.lit("lmod:"))
        .when(F.col("source") == "shorewall", F.lit("kernel:"))
        .when(F.col("source") == "snoopy", F.lit("snoopy:"))
        .otherwise(F.lit("misc:"))
    )
    raw = F.when(
        (F.col("source") == "junk") & (_h(110) % 4 == 3), F.lit("")
    ).otherwise(_envelope(msg, tag))
    return df.select(
        F.format_string("%s-%09d", F.col("source"), F.col("id")).alias("doc_id"),
        F.col("source"),
        raw.alias("raw"),
    )


def raw_sequences(spark: SparkSession, n_rows: int, partitions: int | None = None) -> DataFrame:
    """The canonical tokenized input table (input_hint shape)."""
    lines = raw_lines(spark, n_rows, partitions)
    return lines.select(
        "doc_id",
        tokenize_pandas(F.col("raw")).alias("tokens"),
        F.length("raw").cast("int").alias("n_tok"),
        "source",
    )


def write_corpus(spark: SparkSession, path: str, n_rows: int, partitions: int | None = None) -> None:
    """Materialize the tokenized corpus as parquet, partitioned for
    downstream partition pruning on ``source``."""
    raw_sequences(spark, n_rows, partitions).write.mode("overwrite").parquet(path)
