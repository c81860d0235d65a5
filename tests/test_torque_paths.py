"""Fast-path / slow-path agreement for the torque body parse.

The mega-regex fast path (canonical key order, torque.py) and the
KV-map slow path (any order) must produce IDENTICAL payloads for the
same logical record. We build E/S bodies from a field dict, emit them
(a) in canonical order — exercises the fast path — and (b) with the
Resource_List block order-shuffled — forces the slow path — and assert
the parsed structs match field for field.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from hnormalise_spark import pipeline as P


def _mk_exit_body(k: int, rng: random.Random) -> tuple[str, list[str]]:
    """(common prefix, Resource_List tokens) for a logical record."""
    prefix = (
        f"user=u{k} group=g{k}"
        + (f" account=acc{k}" if k % 3 == 0 else "")
        + f" jobname=job{k} queue=q{k % 4}"
        f" ctime={1500000000 + k} qtime={1500000100 + k} etime={1500000200 + k}"
        + (f" start_count={k % 4}" if k % 5 == 0 else "")
        + f" start={1500000300 + k} owner=u{k}@sub.example.org"
        f" exec_host=n{k % 9}.ex/0-{k % 4 + 1}"
    )
    rl = [
        f"Resource_List.nodect={k % 3 + 1}",
        f"Resource_List.nodes={k % 3 + 1}:ppn={k % 8 + 1}",
        f"Resource_List.walltime={k % 48:02d}:00:00",
    ]
    if k % 2 == 0:
        rl.append(f"Resource_List.vmem={k % 16 + 1}gb")
    if k % 3 == 0:
        rl.append("Resource_List.nice=0")
    if k % 4 == 0:
        rl.append(f"Resource_List.neednodes={k % 3 + 1}:ppn={k % 8 + 1}")
    if k % 5 == 0:
        rl.append(f"Resource_List.qos=qos{k % 2}")
    suffix = (
        f" session={k + 7}"
        + (f" total_execution_slots={(k % 3 + 1) * (k % 8 + 1)}" if k % 2 == 0 else "")
        + (f" unique_node_count={k % 3 + 1}" if k % 3 == 0 else "")
        + f" end={1500009999 + k} Exit_status={k % 7 - 3}"
        f" resources_used.cput={k % 86400}"
        + (" resources_used.energy_used=0" if k % 2 == 0 else "")
        + f" resources_used.mem={k % 99999 + 1}kb resources_used.vmem={k % 999999 + 1}kb"
        f" resources_used.walltime={k % 24:02d}:{k % 60:02d}:11"
    )
    return prefix, rl, suffix


_CANON_RL_ORDER = [
    "Resource_List.mem", "Resource_List.advres", "Resource_List.naccesspolicy",
    "Resource_List.ncpus", "Resource_List.cput", "Resource_List.prologue",
    "Resource_List.epilogue", "Resource_List.neednodes", "Resource_List.nice",
    "Resource_List.nodect", "Resource_List.nodes", "Resource_List.select",
    "Resource_List.qos", "Resource_List.other", "Resource_List.feature",
    "Resource_List.host", "Resource_List.procs", "Resource_List.nodeset",
    "Resource_List.tpn", "Resource_List.pmem", "Resource_List.vmem",
    "Resource_List.pvmem", "Resource_List.mppmem", "Resource_List.walltime",
]


def _canon(rl: list[str]) -> list[str]:
    order = {k: i for i, k in enumerate(_CANON_RL_ORDER)}
    return sorted(rl, key=lambda t: order[t.split("=", 1)[0]])


@pytest.fixture(scope="module")
def path_frames(spark):
    rng = random.Random(1234)
    rows = []
    for k in range(60):
        prefix, rl, suffix = _mk_exit_body(k, rng)
        canonical = f"{prefix} {' '.join(_canon(rl))}{suffix}"
        shuffled_rl = rl[:]
        while len(rl) > 1 and shuffled_rl == _canon(rl):
            rng.shuffle(shuffled_rl)
        shuffled = f"{prefix} {' '.join(shuffled_rl)}{suffix}"
        for variant, body in (("fast", canonical), ("slow", shuffled)):
            line = (
                "<13>1 2017-05-24T18:01:03.000000+02:00 host1 tq: - "
                f"torque: 04/05/2017 13:06:53;E;{k}.m.c.example.org;{body}"
            )
            rows.append((f"{variant}-{k}", variant, k, line))
    df = spark.createDataFrame(rows, "doc_id string, variant string, k int, raw string")
    parsed = P.normalise(df).persist()
    yield parsed
    parsed.unpersist()


def test_both_paths_parse_ok(path_frames):
    assert path_frames.filter(~F.col("parse_ok")).count() == 0


def test_fast_and_slow_payloads_identical(path_frames):
    t = F.col("torque")
    flat = path_frames.select(
        "variant", "k",
        F.to_json(F.struct(
            t["user"], t["account"], t["queue"], t["times"],
            t["resource_request"], t["resource_usage"], t["exec_host"],
            t["total_execution_slots"], t["unique_node_count"],
            t["session"], t["start_count"], t["exit_status"],
        )).alias("payload_json"),
    )
    fast = {r["k"]: r["payload_json"] for r in flat.filter("variant = 'fast'").collect()}
    slow = {r["k"]: r["payload_json"] for r in flat.filter("variant = 'slow'").collect()}
    assert set(fast) == set(slow)
    diffs = {k for k in fast if fast[k] != slow[k]}
    assert not diffs, f"fast/slow divergence for k={sorted(diffs)[:5]}: " + (
        f"fast={fast[min(diffs)][:400]} slow={slow[min(diffs)][:400]}" if diffs else ""
    )
