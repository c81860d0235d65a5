"""Unit goldens for the scalar combinators, transcribed from
/root/reference/test/HNormalise/Torque/ParserSpec.hs:56-415 and
test/HNormalise/Common/ParserSpec.hs."""

from __future__ import annotations

from hnormalise_spark.parsing import common as C
from tests.conftest import col_values


def test_walltime(spark):
    out = col_values(
        spark,
        ["1234567", "12:13", "11:12:13", "10:11:12:13", "x", "1:2:3:4:5", None],
        C.walltime_struct,
    )
    as_tuple = [
        (r["days"], r["hours"], r["minutes"], r["seconds"], r["total_seconds"])
        if r is not None
        else None
        for r in out
    ]
    assert as_tuple == [
        (0, 0, 0, 1234567, 1234567),
        (0, 0, 12, 13, 733),
        (0, 11, 12, 13, 40333),
        (10, 11, 12, 13, 904333),
        None,
        None,
        None,
    ]


def test_memory(spark):
    # ParserSpec.hs:76-131 — every case combination
    cases = {
        "123b": 123, "123B": 123,
        "123kb": 123 * 1024, "123Kb": 123 * 1024, "123kB": 123 * 1024, "123KB": 123 * 1024,
        "123mb": 123 * 1024**2, "123Mb": 123 * 1024**2, "123mB": 123 * 1024**2, "123MB": 123 * 1024**2,
        "123gb": 123 * 1024**3, "123Gb": 123 * 1024**3, "123gB": 123 * 1024**3, "123GB": 123 * 1024**3,
        "123": None, "123tb": None, "b": None,
    }
    out = col_values(spark, list(cases), C.memory_bytes)
    assert out == list(cases.values())


def test_job_name(spark):
    out = col_values(
        spark,
        [
            "123456789.master.mycluster.mydomain;",
            "123456[789].master.mycluster.mydomain;",
            "1166970[].somemaster.somecluster.gent.vsc",
            "161299-389.mymaster.somecluster",
            "123456;",  # bare id must fail (ParserSpec.hs:142-144)
            "123456",
        ],
        C.job_name_struct,
    )
    as_tuple = [
        (r["number"], r["array_id"], r["master"], r["cluster"]) if r else None
        for r in out
    ]
    assert as_tuple == [
        (123456789, None, "master", "mycluster"),
        (123456, 789, "master", "mycluster"),
        (1166970, None, "somemaster", "somecluster"),
        (161299, 389, "mymaster", "somecluster"),
        None,
        None,
    ]


def test_node_list(spark):
    out = col_values(
        spark,
        [
            "1:ppn=2+2",  # ParserSpec.hs:146-152
            "node2801.d:ppn=2+node2803.d:ppn=2",
            "somenode.somecluster.somedomain",
            "node:8",  # ':' not followed by ppn= → reference fails
        ],
        C.node_list,
    )
    def t(r):
        return [(n["number"], n["name"], n["ppn"]) for n in r] if r is not None else None

    assert t(out[0]) == [(1, None, 2), (2, None, None)]
    assert t(out[1]) == [(None, "node2801.d", 2), (None, "node2803.d", 2)]
    assert t(out[2]) == [(None, "somenode.somecluster.somedomain", None)]
    assert t(out[3]) is None


def test_host_list(spark):
    out = col_values(
        spark,
        [
            "node1001.my.d/1,3,5,7",
            "node1001.my.d/1-3,5-7",
            "node1001.my.d/1,3,5-7,9,12-14",
            "n1/1,3,5,7+n2/4-6",
            # same-host merge (aggregateHosts; exit-2014 golden [0..15])
            "+".join(f"node2135.s.d/{i}" for i in range(16)),
            # unsorted host names → sorted output (aggregateHosts sorts)
            "b.host/2+a.host/1+b.host/0",
            "",
            "garbage",
        ],
        C.host_list,
    )

    def t(r):
        return [(h["name"], h["cores"]) for h in r] if r is not None else None

    assert t(out[0]) == [("node1001.my.d", [1, 3, 5, 7])]
    assert t(out[1]) == [("node1001.my.d", [1, 2, 3, 5, 6, 7])]
    assert t(out[2]) == [("node1001.my.d", [1, 3, 5, 6, 7, 9, 12, 13, 14])]
    assert t(out[3]) == [("n1", [1, 3, 5, 7]), ("n2", [4, 5, 6])]
    assert t(out[4]) == [("node2135.s.d", list(range(16)))]
    assert t(out[5]) == [("a.host", [1]), ("b.host", [0, 2])]
    assert t(out[6]) == []
    assert t(out[7]) is None


def test_kv_map_semantics(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("user=a group= exec_host=n/0-1 Resource_List.nodes=1:ppn=2 JUNK",)], "v string"
    )
    row = df.select(
        C.kv_get(C.kv_map(F.col("v")), "user").alias("u"),
        C.kv_get(C.kv_map(F.col("v")), "group").alias("g"),
        C.kv_get(C.kv_map(F.col("v")), "Resource_List.nodes").alias("n"),
        C.kv_has(C.kv_map(F.col("v")), "JUNK").alias("junk_has"),
        C.kv_has(C.kv_map(F.col("v")), "group").alias("group_has"),
        C.kv_has(C.kv_map(F.col("v")), "absent").alias("absent_has"),
    ).collect()[0]
    assert row["u"] == "a"
    assert row["g"] == ""  # empty value is valid for kvTextParser
    assert row["n"] == "1:ppn=2"  # split on *first* '=' only
    assert row["junk_has"] is False  # token without '=' is not a kv
    assert row["group_has"] is True
    assert row["absent_has"] is False
