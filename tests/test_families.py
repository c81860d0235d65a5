"""Lmod / Shorewall / Snoopy golden tests — expected values transcribed
from /root/reference/test/HNormalise/{Lmod,Shorewall,Snoopy}/ParserSpec.hs."""

from __future__ import annotations

from pyspark.sql import functions as F

from hnormalise_spark import pipeline as P
from hnormalise_spark.fixtures import wrap


def _parse_one(spark, msg: str):
    df = spark.createDataFrame([("x", wrap(msg))], "doc_id string, raw string")
    return P.normalise(df).collect()[0]


# --- lmod -------------------------------------------------------------


def test_lmod_load_torque_jobid(parsed_corpus):
    row = parsed_corpus["lm-load-torque"]
    assert row["parser"] == "lmod_load"
    l = row["lmod"]
    assert l["event"] == "load"
    assert l["info"]["username"] == "myuser"
    assert l["info"]["cluster"] == "mycluster"
    assert l["info"]["jobid"]["number"] is None
    assert tuple(l["info"]["jobid"]["torque"]) == (3230905, None, "master", "mycluster")
    assert l["userload"] is True
    assert tuple(l["module"]) == ("GSL", "2.3-intel-2016b")
    assert l["filename"] == "/apps/gent/CO7/sandybridge/modules/all/GSL/2.3-intel-2016b"
    assert l["command"] is None and l["arguments"] is None


def test_lmod_load_slurm_jobid(parsed_corpus):
    l = parsed_corpus["lm-load-slurm"]["lmod"]
    assert l["info"]["jobid"]["number"] == 3230905
    assert l["info"]["jobid"]["torque"] is None


def test_lmod_load_empty_jobid_dot_version(parsed_corpus):
    # ParserSpec.hs:76-90
    l = parsed_corpus["lm-load-empty-jobid"]["lmod"]
    assert l["info"]["jobid"] is None
    assert l["userload"] is False
    assert tuple(l["module"]) == ("cluster", ".mycluster")


def test_lmod_command(parsed_corpus):
    l = parsed_corpus["lm-cmd"]["lmod"]
    assert l["event"] == "command"
    assert l["command"] == "load"
    assert l["arguments"] == "cluster/othercluster"
    assert tuple(l["info"]["jobid"]["torque"]) == (132, None, "mymaster", "mycluster")
    assert l["userload"] is None and l["module"] is None


def test_lmod_invalid_jobid_fails(spark):
    # jobid value matching neither torque name nor bare int → the
    # reference's `char ','` after the jobid fails the whole line.
    row = _parse_one(
        spark,
        "lmod::  username=u, cluster=c, jobid=434.master, userload=yes, module=a/b, fn=/f",
    )
    assert not row["parse_ok"]


# --- shorewall --------------------------------------------------------


def test_shorewall_tcp(parsed_corpus):
    s = parsed_corpus["sw-tcp"]["shorewall"]
    assert tuple(s) == (
        "ext2fw", "REJECT", "em3", None,
        "aa:aa:bb:ff:88:bc:bc:15:80:8b:f8:f8:80:00",
        "78.0.0.1", "150.0.0.1", "TCP", 60048, 22,
    )


def test_shorewall_udp(parsed_corpus):
    s = parsed_corpus["sw-udp"]["shorewall"]
    assert tuple(s) == (
        "ipmi2int", "REJECT", "em4", "em1", None,
        "10.0.0.2", "10.0.0.1", "UDP", 57002, 53,
    )


def test_shorewall_icmp(parsed_corpus):
    s = parsed_corpus["sw-icmp"]["shorewall"]
    assert tuple(s) == (
        "ipmi2ext", "REJECT", "em4", "em3", None,
        "10.0.0.2", "10.0.0.1", "ICMP", None, None,
    )


def test_shorewall_bad_host_fails(spark):
    row = _parse_one(
        spark,
        "kernel:: Shorewall:r:T:IN=em1 OUT=em2 SRC=NOT_A_HOST DST=10.0.0.1 PROTO=ICMP",
    )
    assert not row["parse_ok"]


# --- snoopy -----------------------------------------------------------


def test_snoopy_plain(parsed_corpus):
    s = parsed_corpus["sn-plain"]["snoopy"]
    assert tuple(s) == (
        27316, 110, None, 9379, "(none)", "/",
        "/usr/lib64/nagios/plugins/hpc/check_ifutil.pl",
        "/usr/lib64/nagios/plugins/hpc/check_ifutil.pl -i em1.295 -w 90 -c 95 -p -b 10000m",
    )


def test_snoopy_username(parsed_corpus):
    s = parsed_corpus["sn-username"]["snoopy"]
    assert tuple(s) == (
        28949, 992, "nrpe", 11542, "(none)", "/", "/usr/bin/which", "which python"
    )


def test_snoopy_weird_tty(spark):
    # ParserSpec.hs:72-83
    row = _parse_one(
        spark,
        "snoopy[46513]:: [uid:2540337 sid:19403 tty:ERROR(ttyname_r->EUNKNOWN) "
        "cwd:/vscmnt/gent_vulpix/_/user/home/gent/vsc403/vsc40337/UCS_LABELLED_NEW/20000_to_30000 "
        "filename:/usr/bin/qsub]: qsub -l walltime=72:00:00 job7_21293_30000_doit",
    )
    assert row["parser"] == "snoopy"
    s = row["snoopy"]
    assert s["pid"] == 46513 and s["uid"] == 2540337 and s["username"] is None
    assert s["tty"] == "ERROR(ttyname_r->EUNKNOWN)"
    assert s["executable"] == "/usr/bin/qsub"
    assert s["command"] == "qsub -l walltime=72:00:00 job7_21293_30000_doit"


# --- envelope + dispatch ---------------------------------------------


def test_envelope_fields(parsed_corpus):
    row = parsed_corpus["e2e-lmod-load"]
    assert row["pri"] == 13 and row["version"] == 1
    assert row["hostname"] == "node2159" and row["syslogtag"] == "lmod:"
    assert row["msg"].startswith("lmod:: username=myuser")
    assert row["timereported"] is not None
    assert row["appname"] == "lmod" and row["jsonkey"] == "lmod"


def test_envelope_trailing_newline(parsed_corpus):
    # abort line carries a trailing '\n' (ParserSpec.hs:81-82)
    row = parsed_corpus["e2e-torque-abort"]
    assert row["parse_ok"] and row["parser"] == "torque_abort"
    assert row["msg"] == "torque: 10/17/2013 02:46:14;A;86264.master15.delcatty.gent.vsc;"


def test_appname_mapping(parsed_corpus):
    # getJsonKey / appname (Parser.hs:66-88): shorewall lines carry
    # appname "kernel" but json key "shorewall".
    row = parsed_corpus["sw-tcp"]
    assert row["appname"] == "kernel" and row["jsonkey"] == "shorewall"
    assert parsed_corpus["e2e-snoopy"]["appname"] == "snoopy"
    assert parsed_corpus["tq-queue"]["appname"] == "torque"


def test_failure_rows_have_null_everything(parsed_corpus):
    for fid in ["junk-random", "junk-sshd", "junk-empty", "junk-truncated-torque", "junk-bare-jobid"]:
        row = parsed_corpus[fid]
        assert not row["parse_ok"], fid
        assert row["parser"] is None and row["jsonkey"] is None, fid
        for fam in ["torque", "lmod", "shorewall", "snoopy"]:
            assert row[fam] is None, (fid, fam)


def test_counts(spark, parsed_corpus):
    from hnormalise_spark.fixtures import CORPUS

    rows = [(i, s, p, l) for (i, s, p, l) in CORPUS]
    df = spark.createDataFrame(
        rows, "doc_id string, source string, expected_parser string, raw string"
    )
    parsed = P.normalise(df)
    got = {
        (r["source"], r["parser"], r["parse_ok"]): r["n"]
        for r in P.counts(parsed).collect()
    }
    expected: dict = {}
    for _, src, parser, _ in CORPUS:
        key = (src, parser, parser is not None)
        expected[key] = expected.get(key, 0) + 1
    assert got == expected
