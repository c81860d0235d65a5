"""Torque golden tests — expected structs transcribed from
/root/reference/test/HNormalise/Torque/ParserSpec.hs:417-851."""

from __future__ import annotations


def wt(d, h, m, s):
    return (d, h, m, s, ((d * 24 + h) * 60 + m) * 60 + s)


def walltime_tuple(r):
    return (r["days"], r["hours"], r["minutes"], r["seconds"], r["total_seconds"])


def test_exit_fqdn(parsed_corpus):
    row = parsed_corpus["tq-exit-fqdn"]
    assert row["parse_ok"] and row["parser"] == "torque_exit"
    t = row["torque"]
    assert t["entry_type"] == "TorqueExitEntry"
    assert t["datestamp"] == "04/05/2017 13:06:53"
    assert tuple(t["name"]) == (45, None, "mymaster", "somecluster")
    assert t["user"] == "vsc40075" and t["group"] == "vsc40075"
    assert t["account"] is None
    assert t["jobname"] == "STDIN" and t["queue"] == "short"
    assert t["owner"] == "vsc40075@submitnode01.submitnode.somedomain"
    assert tuple(t["times"]) == (1491390300, 1491390300, 1491390300, 1491390307, 1491390413)
    assert [(h["name"], h["cores"]) for h in t["exec_host"]] == [
        ("node2801.somecluster.somedomain", [0, 1]),
        ("node2803.somecluster.somedomain", [0, 1]),
    ]
    rr = t["resource_request"]
    assert rr["vmem"] == 1024**3
    assert rr["nodect"] == 2 and rr["nice"] == 0
    assert [(n["number"], n["name"], n["ppn"]) for n in rr["nodes"]] == [
        (None, "node2801.somecluster.somedomain", 2),
        (None, "node2803.somecluster.somedomain", 2),
    ]
    assert walltime_tuple(rr["walltime"]) == wt(0, 1, 0, 0)
    assert rr["mem"] is None and rr["cputime"] is None
    ru = t["resource_usage"]
    assert ru["cputime"] == 0 and ru["energy"] == 0
    assert ru["mem"] == 55048 * 1024 and ru["vmem"] == 92488 * 1024
    assert walltime_tuple(ru["walltime"]) == wt(0, 0, 1, 44)
    assert t["total_execution_slots"] == 4 and t["unique_node_count"] == 2
    assert t["exit_status"] == 0
    assert t["session"] == 15273 and t["start_count"] is None


def test_exit_2014_array_merge_and_defaults(parsed_corpus):
    """Array id, same-host merge to [0..15], derived defaults for
    total_execution_slots / unique_node_count (Parser.hs:410-415)."""
    t = parsed_corpus["tq-exit-2014-array"]["torque"]
    assert tuple(t["name"]) == (161299, 389, "mymaster", "somecluster")
    assert [(h["name"], h["cores"]) for h in t["exec_host"]] == [
        ("node2135.somecluster.somedomain", list(range(16)))
    ]
    # absent in line → derived: Σ|cores| and |hosts| after aggregation
    assert t["total_execution_slots"] == 16
    assert t["unique_node_count"] == 1
    # walltime-format cput (00:48:40 → 2920 s)
    assert t["resource_usage"]["cputime"] == 2920
    assert t["resource_request"]["vmem"] == 74737 * 1024**2


def test_exit_cput_request(parsed_corpus):
    t = parsed_corpus["tq-exit-cput"]["torque"]
    assert walltime_tuple(t["resource_request"]["cputime"]) == wt(0, 72, 0, 0)
    assert t["exit_status"] == 271
    assert t["resource_usage"]["cputime"] == 25


def test_exit_account_signed_status(parsed_corpus):
    t = parsed_corpus["tq-exit-account"]["torque"]
    assert t["account"] == "lt1_2017-43"
    assert t["exit_status"] == -11
    assert t["resource_usage"]["cputime"] == 1725002  # bare seconds
    assert t["resource_request"]["vmem"] == 143425316860
    assert t["total_execution_slots"] == 40 and t["unique_node_count"] == 2
    assert [(h["name"], h["cores"]) for h in t["exec_host"]] == [
        ("node2612.swalot.gent.vsc", list(range(20))),
        ("node2681.swalot.gent.vsc", list(range(20))),
    ]


def test_queue(parsed_corpus):
    t = parsed_corpus["tq-queue"]["torque"]
    assert t["entry_type"] == "TorqueQueueEntry"
    assert t["datestamp"] == "06/28/2017 14:31:09"
    assert tuple(t["name"]) == (80, None, "mymaster", "somecluster")
    assert t["queue"] == "default"
    assert t["user"] is None and t["times"] is None


def test_queue_empty_array_id(parsed_corpus):
    t = parsed_corpus["tq-queue-empty-array"]["torque"]
    assert tuple(t["name"]) == (1166970, None, "somemaster", "somecluster")
    assert t["queue"] == "long"


def test_delete(parsed_corpus):
    t = parsed_corpus["tq-delete"]["torque"]
    assert t["entry_type"] == "TorqueDeleteEntry"
    assert tuple(t["requestor"]) == ("vsc40075", "submitnode02.submitnode.somedomain")


def test_abort_rerun(parsed_corpus):
    for fid, et in [("tq-abort", "TorqueAbortEntry"), ("tq-rerun", "TorqueRerunEntry")]:
        t = parsed_corpus[fid]["torque"]
        assert t["entry_type"] == et
        assert tuple(t["name"]) == (34106, None, "mymaster", "somecluster")
        assert t["queue"] is None and t["requestor"] is None


def test_start_out_of_order_resource_list(parsed_corpus):
    """The reference needs its permutation fallback here (vmem/nodes/
    walltime before nodect); the KV-map parse is order-insensitive."""
    row = parsed_corpus["tq-start"]
    assert row["parser"] == "torque_start"
    t = row["torque"]
    assert t["entry_type"] == "TorqueStartEntry"
    assert tuple(t["times"]) == (1497950675, 1497950675, 1497950675, 1497950689, None)
    rr = t["resource_request"]
    assert rr["vmem"] == 4224531456
    assert [(n["number"], n["ppn"]) for n in rr["nodes"]] == [(1, 1)]
    assert walltime_tuple(rr["walltime"]) == wt(0, 0, 10, 0)
    # exit-only fields are null for S entries
    assert t["session"] is None and t["exit_status"] is None
    assert t["resource_usage"] is None
    assert t["total_execution_slots"] is None and t["unique_node_count"] is None


def test_start_2009_fqdn_neednodes(parsed_corpus):
    t = parsed_corpus["tq-start-2009"]["torque"]
    rr = t["resource_request"]
    assert [(n["number"], n["name"], n["ppn"]) for n in rr["neednodes"]] == [
        (None, "node047.cvos.cluster", None)
    ]
    assert [(n["number"], n["name"], n["ppn"]) for n in rr["nodes"]] == [(1, None, None)]
    assert [(h["name"], h["cores"]) for h in t["exec_host"]] == [
        ("node047.cvos.cluster", [4])
    ]


def test_borked_routes_to_failure(parsed_corpus):
    row = parsed_corpus["tq-borked"]
    assert not row["parse_ok"]
    assert row["parser"] is None
    assert row["torque"] is None
