"""Torque accounting-line parser as Spark Column expressions.

Re-expression of /root/reference/src/HNormalise/Torque/Parser.hs
(parseTorqueQueue/Start/Delete/Exit/Abort/Rerun, :328-505).

Line shape: ``torque: <datestamp>;<TAG>;<jobname>;<body>`` where TAG ∈
{Q,S,D,E,A,R} (:328-333). The E/S bodies are space-separated ``k=v``
pairs; the reference parses them with a fixed-order fast path plus a
full permutation fallback (:170-248). Here the body is tokenized into
a KV map once (str_to_map) and each field is a typed lookup — order-
insensitive by construction, same results, one pass.

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
_COMMON_ACC = ["user", "group", "account", "jobname", "queue", "ctime", "qtime", "etime"]
_COMMON_START = ["start", "owner", "exec_host"]
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
    _COMMON_ACC
    + _COMMON_START
    + [f"Resource_List.{k}" for k in _RR_KEYS]
)
_KEYS_EXIT = (
    _KEYS_START
    + _EXIT_ONLY
    + [f"resources_used.{k}" for k in _RU_KEYS]
)

_MANDATORY_EXIT_NUM = ["ctime", "qtime", "etime", "start", "session", "end"]
_MANDATORY_START_NUM = ["ctime", "qtime", "etime", "start"]
_MANDATORY_TEXT = ["user", "group", "jobname", "queue", "owner"]


def _rr(kv: Column) -> Column:
    """Resource_List.* KV map → TorqueResourceRequest struct."""
    def g(key: str) -> Column:
        return C.kv_get(kv, f"Resource_List.{key}")

    fields = [
        C.memory_bytes(g("mem")).alias("mem"),
        g("advres").alias("advres"),
        g("naccesspolicy").alias("naccesspolicy"),
        C.unsigned_long(g("ncpus")).alias("ncpus"),
        C.walltime_struct(g("cput")).alias("cputime"),
        g("prologue").alias("prologue"),
        g("epilogue").alias("epilogue"),
        C.node_list(g("neednodes")).alias("neednodes"),
        C.unsigned_long(g("nice")).alias("nice"),
        C.unsigned_long(g("nodect")).alias("nodect"),
        C.node_list(g("nodes")).alias("nodes"),
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
    ]
    return F.struct(*fields)


def _rr_valid(kv: Column) -> Column:
    """Mandatory nodect/nodes/walltime present; every present optional
    typed key converts cleanly (a malformed present value fails the row
    in the reference's permutation parse too)."""
    def has(key: str) -> Column:
        return C.kv_has(kv, f"Resource_List.{key}")

    def g(key: str) -> Column:
        return C.kv_get(kv, f"Resource_List.{key}")

    cond = (
        has("nodect") & C.unsigned_valid(g("nodect"))
        & has("nodes") & C.node_list_valid(g("nodes"))
        & has("walltime") & C.walltime_valid(g("walltime"))
    )
    for k in _RR_MEM:
        cond = cond & (~has(k) | C.memory_valid(g(k)))
    for k in _RR_NUM:
        cond = cond & (~has(k) | C.unsigned_valid(g(k)))
    cond = cond & (~has("cput") | C.walltime_valid(g("cput")))
    cond = cond & (~has("neednodes") | C.node_list_valid(g("neednodes")))
    return cond


def _ru(kv: Column) -> Column:
    """resources_used.* KV map → TorqueResourceUsage struct; cputime
    normalised to seconds (parseTorqueCpuTime :254-256)."""
    def g(key: str) -> Column:
        return C.kv_get(kv, f"resources_used.{key}")

    return F.struct(
        C.cputime_seconds(g("cput")).alias("cputime"),
        C.unsigned_long(g("energy_used")).alias("energy"),
        C.memory_bytes(g("mem")).alias("mem"),
        C.memory_bytes(g("vmem")).alias("vmem"),
        C.walltime_struct(g("walltime")).alias("walltime"),
    )


def _ru_valid(kv: Column) -> Column:
    def has(key: str) -> Column:
        return C.kv_has(kv, f"resources_used.{key}")

    def g(key: str) -> Column:
        return C.kv_get(kv, f"resources_used.{key}")

    return (
        has("cput") & C.walltime_valid(g("cput"))
        & has("mem") & C.memory_valid(g("mem"))
        & has("vmem") & C.memory_valid(g("vmem"))
        & has("walltime") & C.walltime_valid(g("walltime"))
        & (~has("energy_used") | C.unsigned_valid(g("energy_used")))
    )


def _keys_whitelisted(kv: Column, allowed: list[str]) -> Column:
    lit = F.array(*[F.lit(k) for k in allowed])
    return F.forall(
        F.map_keys(kv), lambda k: F.array_contains(lit, k) | (k == "")
    )


def _acc_valid(kv: Column, mandatory_num: list[str]) -> Column:
    cond = F.lit(True)
    for k in _MANDATORY_TEXT:
        cond = cond & C.kv_has(kv, k)
    for k in mandatory_num:
        cond = cond & C.kv_has(kv, k) & C.unsigned_valid(C.kv_get(kv, k))
    cond = cond & C.kv_has(kv, "exec_host") & C.host_list_valid(C.kv_get(kv, "exec_host"))
    return cond


def parse_torque(msg: Column) -> tuple[Column, Column, Column]:
    """msg → (TORQUE_PAYLOAD struct, parser name, parse_ok).

    Caller gates on ``msg.startswith('torque: ')`` (the dispatch
    prefix, Parser.hs:330) so these expressions only run on torque rows.
    """
    datestamp = F.regexp_extract(msg, RE_HEADER, 1)
    tag = F.regexp_extract(msg, RE_HEADER, 2)
    name_raw = F.regexp_extract(msg, RE_HEADER, 3)
    body = F.regexp_extract(msg, RE_HEADER, 4)
    header_ok = msg.rlike(RE_HEADER)

    name = C.job_name_struct(name_raw)
    name_ok = C.job_name_valid(name_raw)

    kv = C.kv_map(body)

    # --- per-tag validity -------------------------------------------------
    # Q: body must start with queue= (:464-476; no skipSpace before it)
    q_ok = body.rlike(r"^queue=")
    # D: requestor=user@whence (:315-325,419-431)
    d_ok = body.rlike(r"^requestor=[^@ ]*@")
    # A/R: nothing after the name's ';' is required (:435-459)
    ar_ok = F.lit(True)
    e_ok = (
        _acc_valid(kv, _MANDATORY_EXIT_NUM)
        & C.kv_has(kv, "Exit_status") & C.signed_valid(C.kv_get(kv, "Exit_status"))
        & (~C.kv_has(kv, "start_count") | C.unsigned_valid(C.kv_get(kv, "start_count")))
        & (~C.kv_has(kv, "total_execution_slots")
           | C.unsigned_valid(C.kv_get(kv, "total_execution_slots")))
        & (~C.kv_has(kv, "unique_node_count")
           | C.unsigned_valid(C.kv_get(kv, "unique_node_count")))
        & _rr_valid(kv) & _ru_valid(kv)
        & _keys_whitelisted(kv, _KEYS_EXIT)
    )
    s_ok = (
        _acc_valid(kv, _MANDATORY_START_NUM)
        & _rr_valid(kv)
        & _keys_whitelisted(kv, _KEYS_START)
    )

    tag_ok = (
        F.when(tag == "Q", q_ok)
        .when(tag == "D", d_ok)
        .when(tag == "E", e_ok)
        .when(tag == "S", s_ok)
        .when((tag == "A") | (tag == "R"), ar_ok)
        .otherwise(F.lit(False))
    )
    ok = header_ok & name_ok & tag_ok

    # --- payload fields ---------------------------------------------------
    is_acc = (tag == "E") | (tag == "S")  # KV-bodied entries

    exec_host = F.when(is_acc, C.host_list(C.kv_get(kv, "exec_host")))
    # Derived defaults (:410-411,415): slots = Σ|cores|, nodes = |hosts|
    # computed on the *aggregated* host list.
    slots_default = F.aggregate(
        exec_host,
        F.lit(0).cast("long"),
        lambda acc, h: acc + F.size(h["cores"]).cast("long"),
    )
    total_slots = F.when(
        tag == "E",
        F.coalesce(
            C.unsigned_long(C.kv_get(kv, "total_execution_slots")), slots_default
        ),
    )
    unique_nodes = F.when(
        tag == "E",
        F.coalesce(
            C.unsigned_long(C.kv_get(kv, "unique_node_count")),
            F.size(exec_host).cast("long"),
        ),
    )

    times = F.when(
        is_acc,
        F.struct(
            C.unsigned_long(C.kv_get(kv, "ctime")).alias("ctime"),
            C.unsigned_long(C.kv_get(kv, "qtime")).alias("qtime"),
            C.unsigned_long(C.kv_get(kv, "etime")).alias("etime"),
            C.unsigned_long(C.kv_get(kv, "start")).alias("start_time"),
            F.when(tag == "E", C.unsigned_long(C.kv_get(kv, "end"))).alias("end_time"),
        ),
    )

    requestor = F.when(
        tag == "D",
        F.struct(
            F.regexp_extract(body, r"^requestor=([^@ ]*)@", 1).alias("user"),
            F.regexp_extract(body, r"^requestor=[^@ ]*@(\S*)", 1).alias("whence"),
        ),
    )

    queue = (
        F.when(tag == "Q", F.regexp_extract(body, r"^queue=(\S*)", 1))
        .when(is_acc, C.kv_get(kv, "queue"))
    )

    entry_type = F.element_at(
        F.create_map(*[F.lit(x) for kv_ in ENTRY_TYPE.items() for x in kv_]), tag
    )
    parser = F.element_at(
        F.create_map(*[F.lit(x) for kv_ in PARSER_NAME.items() for x in kv_]), tag
    )

    payload = F.struct(
        entry_type.alias("entry_type"),
        datestamp.alias("datestamp"),
        name.alias("name"),
        F.when(is_acc, C.kv_get(kv, "user")).alias("user"),
        F.when(is_acc, C.kv_get(kv, "group")).alias("group"),
        F.when(is_acc, C.kv_get(kv, "account")).alias("account"),
        F.when(is_acc, C.kv_get(kv, "jobname")).alias("jobname"),
        queue.alias("queue"),
        requestor.alias("requestor"),
        F.when(tag == "E", C.unsigned_long(C.kv_get(kv, "start_count"))).alias("start_count"),
        F.when(is_acc, C.kv_get(kv, "owner")).alias("owner"),
        F.when(tag == "E", C.unsigned_long(C.kv_get(kv, "session"))).alias("session"),
        times.alias("times"),
        exec_host.alias("exec_host"),
        F.when(is_acc, _rr(kv)).alias("resource_request"),
        F.when(tag == "E", _ru(kv)).alias("resource_usage"),
        total_slots.alias("total_execution_slots"),
        unique_nodes.alias("unique_node_count"),
        F.when(tag == "E", C.signed_long(C.kv_get(kv, "Exit_status"))).alias("exit_status"),
    )

    null_payload = F.lit(None).cast(TORQUE_PAYLOAD)
    payload = F.when(ok, payload).otherwise(null_payload)
    parser = F.when(ok, parser)
    return payload, parser, ok
