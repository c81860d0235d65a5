"""Torque accounting-line parser as Spark Column expressions.

Re-expression of /root/reference/src/HNormalise/Torque/Parser.hs
(parseTorqueQueue/Start/Delete/Exit/Abort/Rerun, :328-505).

Line shape: ``torque: <datestamp>;<TAG>;<jobname>;<body>`` where TAG ∈
{Q,S,D,E,A,R} (:328-333). The E/S bodies are space-separated ``k=v``
pairs; the reference parses them with a fixed-order fast path plus a
full permutation fallback (:170-248). Here the body is tokenized into
a KV map once (str_to_map) and each field is a typed lookup — order-
insensitive by construction, same results, one pass.

Physical-plan note: the parse is split into *layers* of materialized
intermediate columns (header fields → KV map → aggregated exec_host /
validity → payload struct). Each layer is a separate Project that
Catalyst keeps (non-cheap exprs referenced >1× aren't collapsed), so
the KV map and validity predicates evaluate once per row and the
generated code stays small enough for whole-stage codegen.

Intentional, documented deviations from attoparsec semantics:
* Common accounting fields (user…etime, :337-358) are also accepted
  out of order (the reference requires them ordered; real Torque logs
  always order them).
* Unknown keys anywhere in an E/S body fail the row (key whitelist).
  The reference fails on unknown keys *between* parsed fields but
  tolerates trailing junk after the last field.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from hnormalise_spark.parsing import common as C
from hnormalise_spark.schemas import TORQUE_PAYLOAD

RE_HEADER = r"^torque: ([^;]*);([QSDEAR]);([^;]*);((?s).*)$"

ENTRY_TYPE = {
    "Q": "TorqueQueueEntry",
    "S": "TorqueStartEntry",
    "D": "TorqueDeleteEntry",
    "E": "TorqueExitEntry",
    "A": "TorqueAbortEntry",
    "R": "TorqueRerunEntry",
}
PARSER_NAME = {
    "Q": "torque_queue",
    "S": "torque_start",
    "D": "torque_delete",
    "E": "torque_exit",
    "A": "torque_abort",
    "R": "torque_rerun",
}

# Key inventories for the KV bodies (parseTorqueExit :376-415,
# parseTorqueStart :480-505, parseCommonAccountingInfo :337-358,
# parseCommonStartInfo :362-372, parseTorqueResourceRequest :170-248,
# parseTorqueResourceUsage :260-273).
_RR_TEXT = [
    "advres", "naccesspolicy", "prologue", "epilogue", "select", "qos",
    "other", "feature", "host", "procs", "nodeset", "tpn",
]
_RR_MEM = ["mem", "pmem", "vmem", "pvmem", "mppmem"]
_RR_NUM = ["ncpus", "nice"]
_RR_KEYS = (
    _RR_TEXT + _RR_MEM + _RR_NUM + ["cput", "neednodes", "nodect", "nodes", "walltime"]
)
_RU_KEYS = ["cput", "energy_used", "mem", "vmem", "walltime"]
_EXIT_ONLY = [
    "start_count", "session", "total_execution_slots", "unique_node_count",
    "end", "Exit_status",
]
_KEYS_START = (
    ["user", "group", "account", "jobname", "queue", "ctime", "qtime", "etime"]
    + ["start", "owner", "exec_host"]
    + [f"Resource_List.{k}" for k in _RR_KEYS]
)
_KEYS_EXIT = _KEYS_START + _EXIT_ONLY + [f"resources_used.{k}" for k in _RU_KEYS]

_MANDATORY_TEXT = ["user", "group", "jobname", "queue", "owner"]


def _kv() -> Column:
    return F.col("_tq_kv")


def _g(key: str) -> Column:
    return F.element_at(_kv(), F.lit(key))


def _has(key: str) -> Column:
    return F.map_contains_key(_kv(), F.lit(key)) & _g(key).isNotNull()


def _rr_valid() -> Column:
    cond = (
        _has("Resource_List.nodect") & C.unsigned_valid(_g("Resource_List.nodect"))
        & _has("Resource_List.nodes") & C.node_list_valid(_g("Resource_List.nodes"))
        & _has("Resource_List.walltime") & C.walltime_valid(_g("Resource_List.walltime"))
    )
    for k in _RR_MEM:
        cond = cond & (~_has(f"Resource_List.{k}") | C.memory_valid(_g(f"Resource_List.{k}")))
    for k in _RR_NUM:
        cond = cond & (~_has(f"Resource_List.{k}") | C.unsigned_valid(_g(f"Resource_List.{k}")))
    cond = cond & (~_has("Resource_List.cput") | C.walltime_valid(_g("Resource_List.cput")))
    cond = cond & (~_has("Resource_List.neednodes") | C.node_list_valid(_g("Resource_List.neednodes")))
    return cond


def _ru_valid() -> Column:
    return (
        _has("resources_used.cput") & C.walltime_valid(_g("resources_used.cput"))
        & _has("resources_used.mem") & C.memory_valid(_g("resources_used.mem"))
        & _has("resources_used.vmem") & C.memory_valid(_g("resources_used.vmem"))
        & _has("resources_used.walltime") & C.walltime_valid(_g("resources_used.walltime"))
        & (~_has("resources_used.energy_used") | C.unsigned_valid(_g("resources_used.energy_used")))
    )


def _whitelist_regex(allowed: list[str]) -> str:
    """One anchored possessive regex asserting every space-separated
    token is ``<known-key>=<value>``. Longest-first alternation inside
    an atomic group: the committed alternative is always the longest
    matching key, and possessive quantifiers forbid backtracking, so
    the scan is linear. (A forall() over map_keys is a CodegenFallback
    HOF — orders of magnitude slower per row.)"""
    import re as _re

    alts = "|".join(_re.escape(k) for k in sorted(allowed, key=len, reverse=True))
    return rf"^(?:[ ]*+(?>{alts})=\S*+)*+[ ]*+$"


_WL_EXIT = None  # filled below once _whitelist_regex exists
_WL_START = None


def _keys_whitelisted(allowed: list[str]) -> Column:
    rx = _WL_EXIT if allowed is _KEYS_EXIT else _WL_START
    return F.col("_tq_body").rlike(rx)


_WL_EXIT = _whitelist_regex(_KEYS_EXIT)
_WL_START = _whitelist_regex(_KEYS_START)


def _acc_valid(mandatory_num: list[str]) -> Column:
    cond = F.lit(True)
    for k in _MANDATORY_TEXT:
        cond = cond & _has(k)
    for k in mandatory_num:
        cond = cond & _has(k) & C.unsigned_valid(_g(k))
    return cond & _has("exec_host") & C.host_list_valid(_g("exec_host"))


def layers(gate: Column, msg: Column) -> list[dict[str, Column]]:
    """Materialized intermediate layers (each dict = one withColumns)."""
    tag = F.regexp_extract(msg, RE_HEADER, 2)
    layer1 = {
        "_tq_hdr_ok": F.when(gate, msg.rlike(RE_HEADER)).otherwise(F.lit(False)),
        "_tq_datestamp": F.when(gate, F.regexp_extract(msg, RE_HEADER, 1)),
        "_tq_tag": F.when(gate, tag),
        "_tq_name_raw": F.when(gate, F.regexp_extract(msg, RE_HEADER, 3)),
        "_tq_body": F.when(gate, F.regexp_extract(msg, RE_HEADER, 4)),
    }

    tag_c = F.col("_tq_tag")
    is_acc = (tag_c == "E") | (tag_c == "S")
    layer2 = {
        "_tq_is_acc": F.coalesce(is_acc, F.lit(False)),
        "_tq_kv": F.when(is_acc, C.kv_map(F.col("_tq_body"))),
        "_tq_name": C.job_name_struct(F.col("_tq_name_raw")),
        "_tq_name_ok": F.coalesce(C.job_name_valid(F.col("_tq_name_raw")), F.lit(False)),
    }

    body = F.col("_tq_body")
    e_ok = (
        _acc_valid(["ctime", "qtime", "etime", "start", "session", "end"])
        & _has("Exit_status") & C.signed_valid(_g("Exit_status"))
        & (~_has("start_count") | C.unsigned_valid(_g("start_count")))
        & (~_has("total_execution_slots") | C.unsigned_valid(_g("total_execution_slots")))
        & (~_has("unique_node_count") | C.unsigned_valid(_g("unique_node_count")))
        & _rr_valid() & _ru_valid()
        & _keys_whitelisted(_KEYS_EXIT)
    )
    s_ok = (
        _acc_valid(["ctime", "qtime", "etime", "start"])
        & _rr_valid()
        & _keys_whitelisted(_KEYS_START)
    )
    tag_ok = (
        F.when(tag_c == "Q", body.rlike(r"^queue="))
        .when(tag_c == "D", body.rlike(r"^requestor=[^@ ]*@"))
        .when(tag_c == "E", e_ok)
        .when(tag_c == "S", s_ok)
        .when((tag_c == "A") | (tag_c == "R"), F.lit(True))
        .otherwise(F.lit(False))
    )
    # layer3 is HOF-free (pure regex/map-lookup validity) so it stays
    # inside whole-stage codegen; layer4 quarantines the higher-order
    # array functions (CodegenFallback — they force their Project to
    # interpreted mode) into one minimal Project, gated on _tq_ok so
    # they only evaluate for valid accounting rows.
    layer3 = {
        "_tq_ok": F.col("_tq_hdr_ok")
        & F.col("_tq_name_ok")
        & F.coalesce(tag_ok, F.lit(False)),
    }
    acc_ok = F.col("_tq_ok") & F.col("_tq_is_acc")
    exec_host = F.when(acc_ok, C.host_list(_g("exec_host")))
    layer4 = {
        "_tq_exec": exec_host,
        "_tq_nodes": F.when(acc_ok, C.node_list(_g("Resource_List.nodes"))),
        "_tq_neednodes": F.when(acc_ok, C.node_list(_g("Resource_List.neednodes"))),
    }
    layer5 = {
        "_tq_slots_default": F.when(
            acc_ok,
            F.aggregate(
                F.col("_tq_exec"),
                F.lit(0).cast("long"),
                lambda acc, h: acc + F.size(h["cores"]).cast("long"),
            ),
        ),
        "_tq_nhosts": F.when(acc_ok, F.size(F.col("_tq_exec")).cast("long")),
    }
    return [layer1, layer2, layer3, layer4, layer5]


def _rr_struct() -> Column:
    def g(key: str) -> Column:
        return _g(f"Resource_List.{key}")

    return F.struct(
        C.memory_bytes(g("mem")).alias("mem"),
        g("advres").alias("advres"),
        g("naccesspolicy").alias("naccesspolicy"),
        C.unsigned_long(g("ncpus")).alias("ncpus"),
        C.walltime_struct(g("cput")).alias("cputime"),
        g("prologue").alias("prologue"),
        g("epilogue").alias("epilogue"),
        F.col("_tq_neednodes").alias("neednodes"),
        C.unsigned_long(g("nice")).alias("nice"),
        C.unsigned_long(g("nodect")).alias("nodect"),
        F.col("_tq_nodes").alias("nodes"),
        g("select").alias("select"),
        g("qos").alias("qos"),
        g("other").alias("other"),
        g("feature").alias("feature"),
        g("host").alias("host"),
        g("procs").alias("procs"),
        g("nodeset").alias("nodeset"),
        g("tpn").alias("tpn"),
        C.memory_bytes(g("pmem")).alias("pmem"),
        C.memory_bytes(g("vmem")).alias("vmem"),
        C.memory_bytes(g("pvmem")).alias("pvmem"),
        C.memory_bytes(g("mppmem")).alias("mppmem"),
        C.walltime_struct(g("walltime")).alias("walltime"),
    )


def result() -> tuple[Column, Column, Column]:
    """(payload, parser, ok) — references the materialized _tq_* columns."""
    ok = F.col("_tq_ok")
    tag = F.col("_tq_tag")
    is_acc = F.col("_tq_is_acc")
    body = F.col("_tq_body")
    exec_host = F.col("_tq_exec")

    total_slots = F.when(
        tag == "E",
        F.coalesce(
            C.unsigned_long(_g("total_execution_slots")), F.col("_tq_slots_default")
        ),
    )
    unique_nodes = F.when(
        tag == "E",
        F.coalesce(C.unsigned_long(_g("unique_node_count")), F.col("_tq_nhosts")),
    )
    times = F.when(
        is_acc,
        F.struct(
            C.unsigned_long(_g("ctime")).alias("ctime"),
            C.unsigned_long(_g("qtime")).alias("qtime"),
            C.unsigned_long(_g("etime")).alias("etime"),
            C.unsigned_long(_g("start")).alias("start_time"),
            F.when(tag == "E", C.unsigned_long(_g("end"))).alias("end_time"),
        ),
    )
    requestor = F.when(
        tag == "D",
        F.struct(
            F.regexp_extract(body, r"^requestor=([^@ ]*)@", 1).alias("user"),
            F.regexp_extract(body, r"^requestor=[^@ ]*@(\S*)", 1).alias("whence"),
        ),
    )
    queue = F.when(tag == "Q", F.regexp_extract(body, r"^queue=(\S*)", 1)).when(
        is_acc, _g("queue")
    )
    ru = F.struct(
        C.cputime_seconds(_g("resources_used.cput")).alias("cputime"),
        C.unsigned_long(_g("resources_used.energy_used")).alias("energy"),
        C.memory_bytes(_g("resources_used.mem")).alias("mem"),
        C.memory_bytes(_g("resources_used.vmem")).alias("vmem"),
        C.walltime_struct(_g("resources_used.walltime")).alias("walltime"),
    )
    entry_type = F.element_at(
        F.create_map(*[F.lit(x) for kv in ENTRY_TYPE.items() for x in kv]), tag
    )
    parser = F.element_at(
        F.create_map(*[F.lit(x) for kv in PARSER_NAME.items() for x in kv]), tag
    )

    payload = F.struct(
        entry_type.alias("entry_type"),
        F.col("_tq_datestamp").alias("datestamp"),
        F.col("_tq_name").alias("name"),
        F.when(is_acc, _g("user")).alias("user"),
        F.when(is_acc, _g("group")).alias("group"),
        F.when(is_acc, _g("account")).alias("account"),
        F.when(is_acc, _g("jobname")).alias("jobname"),
        queue.alias("queue"),
        requestor.alias("requestor"),
        F.when(tag == "E", C.unsigned_long(_g("start_count"))).alias("start_count"),
        F.when(is_acc, _g("owner")).alias("owner"),
        F.when(tag == "E", C.unsigned_long(_g("session"))).alias("session"),
        times.alias("times"),
        exec_host.alias("exec_host"),
        F.when(is_acc, _rr_struct()).alias("resource_request"),
        F.when(tag == "E", ru).alias("resource_usage"),
        total_slots.alias("total_execution_slots"),
        unique_nodes.alias("unique_node_count"),
        F.when(tag == "E", C.signed_long(_g("Exit_status"))).alias("exit_status"),
    )

    payload = F.when(ok, payload).otherwise(F.lit(None).cast(TORQUE_PAYLOAD))
    return payload, F.when(ok, parser), ok


INTERMEDIATE_COLS = [
    "_tq_hdr_ok", "_tq_datestamp", "_tq_tag", "_tq_name_raw", "_tq_body",
    "_tq_is_acc", "_tq_kv", "_tq_name", "_tq_name_ok", "_tq_ok", "_tq_exec",
    "_tq_nodes", "_tq_neednodes", "_tq_slots_default", "_tq_nhosts",
]
