"""Resource-request permutation goldens transcribed verbatim from
/root/reference/test/HNormalise/Torque/ParserSpec.hs:154-383
(parseTorqueResourceRequest): in-order, reversed, mem fields, advres,
qos, 2014-era, FQDN-no-ppn, and no-neednodes variants. The reference
tests the fragment parser directly; here each fragment rides a minimal
valid S (start) line through the FULL dispatch, which additionally
pins the gate + mega-regex/KV-fallback agreement on every variant."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hnormalise_spark import pipeline as P
from hnormalise_spark.fixtures import wrap

PREFIX = (
    "torque: 06/20/2017 11:24:49;S;63.mymaster.somecluster.somedomain;"
    "user=u group=g jobname=j queue=q ctime=1 qtime=1 etime=1 start=2 "
    "owner=u@submit.example.org exec_host=n1.example.org/0 "
)

KB = 1024
MB = 1024 * 1024

# (case id, verbatim Resource_List fragment, expected overrides)
# expected keys not listed are asserted None; nodes/neednodes tuples
# are (number, name, ppn); walltime is (d, h, m, s).
CASES = [
    (
        "in_order",  # ParserSpec.hs:155
        "Resource_List.neednodes=1:ppn=1 Resource_List.nodect=1 "
        "Resource_List.nodes=1:ppn=1 Resource_List.walltime=01:00:00",
        {
            "neednodes": [(1, None, 1)],
            "nodect": 1,
            "nodes": [(1, None, 1)],
            "walltime": (0, 1, 0, 0),
        },
    ),
    (
        "reverse_order",  # ParserSpec.hs:184
        "Resource_List.walltime=01:00:00 Resource_List.nodes=1:ppn=1 "
        "Resource_List.nodect=1 Resource_List.neednodes=1:ppn=1",
        {
            "neednodes": [(1, None, 1)],
            "nodect": 1,
            "nodes": [(1, None, 1)],
            "walltime": (0, 1, 0, 0),
        },
    ),
    (
        "mem_fields",  # ParserSpec.hs:213 (vmem/pvmem/pmem, mixed case units)
        "Resource_List.vmem=1mb Resource_List.walltime=01:00:00 "
        "Resource_List.pvmem=400kb Resource_List.pmem=200kB "
        "Resource_List.nodes=1:ppn=1 Resource_List.nodect=1 "
        "Resource_List.neednodes=1:ppn=1",
        {
            "neednodes": [(1, None, 1)],
            "nodect": 1,
            "nodes": [(1, None, 1)],
            "walltime": (0, 1, 0, 0),
            "pmem": 200 * KB,
            "vmem": 1 * MB,
            "pvmem": 400 * KB,
        },
    ),
    (
        "advres",  # ParserSpec.hs:242 (reservation)
        "Resource_List.walltime=01:00:00 Resource_List.advres=myreservation.1 "
        "Resource_List.nodes=1:ppn=1 Resource_List.nodect=1 "
        "Resource_List.neednodes=1:ppn=1",
        {
            "advres": "myreservation.1",
            "neednodes": [(1, None, 1)],
            "nodect": 1,
            "nodes": [(1, None, 1)],
            "walltime": (0, 1, 0, 0),
        },
    ),
    (
        "qos",  # ParserSpec.hs:271
        "Resource_List.walltime=01:00:00 Resource_List.nodes=1:ppn=1 "
        "Resource_List.qos=someqos Resource_List.nodect=1 "
        "Resource_List.neednodes=1:ppn=1",
        {
            "qos": "someqos",
            "neednodes": [(1, None, 1)],
            "nodect": 1,
            "nodes": [(1, None, 1)],
            "walltime": (0, 1, 0, 0),
        },
    ),
    (
        "era_2014",  # ParserSpec.hs:300
        "Resource_List.neednodes=1:ppn=16 Resource_List.nice=0 "
        "Resource_List.nodect=1 Resource_List.nodes=1:ppn=16 "
        "Resource_List.vmem=74737mb Resource_List.walltime=05:00:00",
        {
            "neednodes": [(1, None, 16)],
            "nice": 0,
            "nodect": 1,
            "nodes": [(1, None, 16)],
            "vmem": 74737 * MB,
            "walltime": (0, 5, 0, 0),
        },
    ),
    (
        "fqdn_no_ppn",  # ParserSpec.hs:328
        "Resource_List.neednodes=somenode.somecluster.somedomain "
        "Resource_List.nice=0 Resource_List.nodect=1 Resource_List.nodes=1 "
        "Resource_List.walltime=01:00:00",
        {
            "neednodes": [(None, "somenode.somecluster.somedomain", None)],
            "nice": 0,
            "nodect": 1,
            "nodes": [(1, None, None)],
            "walltime": (0, 1, 0, 0),
        },
    ),
    (
        "no_neednodes",  # ParserSpec.hs:356
        "Resource_List.nice=0 Resource_List.nodect=1 "
        "Resource_List.nodes=1:ppn=8 Resource_List.walltime=03:00:00",
        {
            "nice": 0,
            "nodect": 1,
            "nodes": [(1, None, 8)],
            "walltime": (0, 3, 0, 0),
        },
    ),
]

NULL_DEFAULT = [
    "mem", "advres", "naccesspolicy", "ncpus", "cputime", "prologue",
    "epilogue", "neednodes", "nice", "select", "qos", "other", "feature",
    "host", "procs", "nodeset", "tpn", "pmem", "vmem", "pvmem", "mppmem",
]


@pytest.fixture(scope="module")
def parsed_rr(spark):
    rows = [
        (cid, "torque", wrap(PREFIX + frag, tag="torque")) for cid, frag, _ in CASES
    ]
    df = spark.createDataFrame(rows, "doc_id string, source string, raw string")
    return {r["doc_id"]: r for r in P.normalise(df).collect()}


def _nodes(arr):
    return [(n["number"], n["name"], n["ppn"]) for n in arr] if arr is not None else None


@pytest.mark.parametrize("cid,frag,want", CASES, ids=[c[0] for c in CASES])
def test_resource_request_golden(parsed_rr, cid, frag, want):
    row = parsed_rr[cid]
    assert row["parse_ok"] and row["parser"] == "torque_start", cid
    rr = row["torque"]["resource_request"]

    wt = want["walltime"]
    assert (rr["walltime"]["days"], rr["walltime"]["hours"],
            rr["walltime"]["minutes"], rr["walltime"]["seconds"]) == wt
    assert rr["nodect"] == want["nodect"]
    assert _nodes(rr["nodes"]) == want["nodes"]
    assert _nodes(rr["neednodes"]) == want.get("neednodes")

    for field in NULL_DEFAULT:
        if field in ("neednodes",):
            continue
        expected = want.get(field)
        got = rr[field]
        assert got == expected, (cid, field, got, expected)
