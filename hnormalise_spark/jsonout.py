"""JSON output shaping — byte-exact re-expression of the reference's
aeson encoders (J1-J6 in SURVEY §2.5).

Spark's ``to_json`` can't express two things the aeson encoders do:
sum-typed values whose JSON *shape* varies per row (LmodJobId is a bare
int or an object, Lmod/Json.hs:74-76; TorqueJobNode is one of two
record shapes, Torque/Json.hs:60-62), and per-type null policies
(generic encoders keep nulls, the hand-written Shorewall encoder omits
absent fields, Shorewall/Json.hs:56-77). So the encoder is a small
combinator set over JVM string expressions: each leaf is JSON-escaped
via ``to_json(array(x))`` (string escaping only — everything stays in
whole-stage codegen), and objects/arrays are concat-assembled with the
exact field order of the Haskell records.

Known deviation: the reference emits fwdpt under a *duplicate* "fwdst"
key (Shorewall/Json.hs:76 — a bug); we emit "fwdpt" (SURVEY §7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def NULL() -> Column:  # lit() needs an active session; defer
    return F.lit("null")


def jstr(c: Column) -> Column:
    """String → JSON string literal (escaped), null → 'null'."""
    arr = F.to_json(F.array(c))
    return arr.substr(F.lit(2), F.length(arr) - 2)


def jnum(c: Column) -> Column:
    return F.coalesce(c.cast("string"), NULL())


def jbool(c: Column) -> Column:
    return F.coalesce(F.when(c, "true").otherwise("false"), NULL())


def jobj(*pairs: tuple[str, Column]) -> Column:
    """Object with fixed key order; value columns may be the literal
    'null' (kept) or NULL (member omitted — concat_ws skips nulls)."""
    members = [
        F.when(v.isNotNull(), F.concat(F.lit(f'"{k}":'), v)) for k, v in pairs
    ]
    return F.concat(F.lit("{"), F.concat_ws(",", *members), F.lit("}"))


def _fold_concat(args: list) -> Column:
    """ONE flat concat, with adjacent string literals pre-merged: the
    per-member ``concat`` + ``concat_ws`` + brace-``concat`` tower
    allocates an intermediate UTF8String per member per row; a single
    concat writes the output once. Only valid when every member is
    always present (no omit-when-null members)."""
    folded: list = []
    for a in args:
        if isinstance(a, str) and folded and isinstance(folded[-1], str):
            folded[-1] += a
        else:
            folded.append(a)
    return F.concat(*[F.lit(a) if isinstance(a, str) else a for a in folded])


def jobjd(*pairs: tuple[str, Column]) -> Column:
    """Dense object — the generic-aeson-encoder case where every member
    is ALWAYS emitted (absent values render as the literal 'null', the
    rendered columns are never SQL-null). Byte-identical to ``jobj``
    on such members, but one flat concat instead of ~2N expressions."""
    args: list = []
    for i, (k, v) in enumerate(pairs):
        args.append(("{" if i == 0 else ",") + f'"{k}":')
        args.append(v)
    args.append("}")
    return _fold_concat(args)


def opt(v: Column, rendered: Column) -> Column:
    """Omit-when-null member (hand-rolled encoders): NULL-out the
    rendered value when the source value is null."""
    return F.when(v.isNotNull(), rendered)


def jarr(elems: Column) -> Column:
    """array<string of rendered JSON> → JSON array, null → 'null'."""
    return F.coalesce(
        F.concat(F.lit("["), F.array_join(elems, ","), F.lit("]")), NULL()
    )


def guard(struct: Column, rendered: Column) -> Column:
    """Whole-object null: render 'null' when the struct itself is null."""
    return F.coalesce(F.when(struct.isNotNull(), rendered), NULL())


# ---------------------------------------------------------------------------
# shared pieces


def _job_name(n: Column) -> Column:
    # TorqueJobName generic encoder: number, arrayId, master, cluster
    return guard(
        n,
        jobjd(
            ("number", jnum(n["number"])),
            ("arrayId", jnum(n["array_id"])),
            ("master", jstr(n["master"])),
            ("cluster", jstr(n["cluster"])),
        ),
    )


def _walltime_secs(w: Column) -> Column:
    # TorqueWalltime.toEncoding → total seconds (Torque/Json.hs:57-58)
    return jnum(w["total_seconds"])


def _exec_host(eh: Column) -> Column:
    return jarr(
        F.transform(
            eh,
            lambda h: jobjd(
                ("name", jstr(h["name"])),
                ("cores", jarr(F.transform(h["cores"], lambda c: c.cast("string")))),
            ),
        )
    )


def _node_list(nl: Column) -> Column:
    # TorqueJobNode sum: TSN → {"number":..,"ppn":..}, TFN →
    # {"name":..,"ppn":..} (generic encoders keep null ppn)
    return jarr(
        F.transform(
            nl,
            lambda nd: F.when(
                nd["number"].isNotNull(),
                jobjd(("number", jnum(nd["number"])), ("ppn", jnum(nd["ppn"]))),
            ).otherwise(
                jobjd(("name", jstr(nd["name"])), ("ppn", jnum(nd["ppn"]))),
            ),
        )
    )


def _resource_request(rr: Column) -> Column:
    return guard(
        rr,
        jobjd(
            ("mem", jnum(rr["mem"])),
            ("advres", jstr(rr["advres"])),
            ("naccesspolicy", jstr(rr["naccesspolicy"])),
            ("ncpus", jnum(rr["ncpus"])),
            ("cputime", F.coalesce(F.when(rr["cputime"].isNotNull(), _walltime_secs(rr["cputime"])), NULL())),
            ("prologue", jstr(rr["prologue"])),
            ("epilogue", jstr(rr["epilogue"])),
            ("neednodes", _node_list(rr["neednodes"])),
            ("nice", jnum(rr["nice"])),
            ("nodeCount", jnum(rr["nodect"])),
            ("nodes", _node_list(rr["nodes"])),
            ("select", jstr(rr["select"])),
            ("qos", jstr(rr["qos"])),
            ("other", jstr(rr["other"])),
            ("feature", jstr(rr["feature"])),
            ("host", jstr(rr["host"])),
            ("procs", jstr(rr["procs"])),
            ("nodeset", jstr(rr["nodeset"])),
            ("tpn", jstr(rr["tpn"])),
            ("pmem", jnum(rr["pmem"])),
            ("vmem", jnum(rr["vmem"])),
            ("pvmem", jnum(rr["pvmem"])),
            ("mppmem", jnum(rr["mppmem"])),
            ("walltime", _walltime_secs(rr["walltime"])),
        ),
    )


def _times(t: Column) -> Column:
    return guard(
        t,
        jobjd(
            ("ctime", jnum(t["ctime"])),
            ("qtime", jnum(t["qtime"])),
            ("etime", jnum(t["etime"])),
            ("startTime", jnum(t["start_time"])),
            ("endTime", jnum(t["end_time"])),
        ),
    )


def _resource_usage(ru: Column) -> Column:
    return guard(
        ru,
        jobjd(
            ("cputime", jnum(ru["cputime"])),
            ("energy", jnum(ru["energy"])),
            ("mem", jnum(ru["mem"])),
            ("vmem", jnum(ru["vmem"])),
            ("walltime", _walltime_secs(ru["walltime"])),
        ),
    )


def torque_json(t: Column) -> Column:
    """TorqueParseResult encoder (Torque/Json.hs; field order = record
    order in Torque/Internal.hs, asserted by the e2e golden at
    test/HNormalise/ParserSpec.hs:78)."""
    et = t["entry_type"]
    common = [("torqueDatestamp", jstr(t["datestamp"])), ("name", _job_name(t["name"]))]
    q = jobjd(*common, ("queue", jstr(t["queue"])), ("torqueEntryType", F.lit('"TorqueQueueEntry"')))
    d = jobjd(
        *common,
        ("requestor", guard(t["requestor"], jobjd(
            ("user", jstr(t["requestor"]["user"])),
            ("whence", jstr(t["requestor"]["whence"])),
        ))),
        ("torqueEntryType", F.lit('"TorqueDeleteEntry"')),
    )
    a = jobjd(*common, ("torqueEntryType", F.lit('"TorqueAbortEntry"')))
    r = jobjd(*common, ("torqueEntryType", F.lit('"TorqueRerunEntry"')))
    s = jobjd(
        *common,
        ("user", jstr(t["user"])),
        ("group", jstr(t["group"])),
        ("account", jstr(t["account"])),
        ("jobname", jstr(t["jobname"])),
        ("queue", jstr(t["queue"])),
        ("owner", jstr(t["owner"])),
        ("times", _times(t["times"])),
        ("execHost", _exec_host(t["exec_host"])),
        ("resourceRequest", _resource_request(t["resource_request"])),
        ("torqueEntryType", F.lit('"TorqueStartEntry"')),
    )
    e = jobjd(
        *common,
        ("user", jstr(t["user"])),
        ("group", jstr(t["group"])),
        ("account", jstr(t["account"])),
        ("jobname", jstr(t["jobname"])),
        ("queue", jstr(t["queue"])),
        ("startCount", jnum(t["start_count"])),
        ("owner", jstr(t["owner"])),
        ("session", jnum(t["session"])),
        ("times", _times(t["times"])),
        ("execHost", _exec_host(t["exec_host"])),
        ("resourceRequest", _resource_request(t["resource_request"])),
        ("resourceUsage", _resource_usage(t["resource_usage"])),
        ("totalExecutionSlots", jnum(t["total_execution_slots"])),
        ("uniqueNodeCount", jnum(t["unique_node_count"])),
        ("exitStatus", jnum(t["exit_status"])),
        ("torqueEntryType", F.lit('"TorqueExitEntry"')),
    )
    return (
        F.when(et == "TorqueQueueEntry", q)
        .when(et == "TorqueStartEntry", s)
        .when(et == "TorqueDeleteEntry", d)
        .when(et == "TorqueExitEntry", e)
        .when(et == "TorqueAbortEntry", a)
        .when(et == "TorqueRerunEntry", r)
    )


def lmod_json(l: Column) -> Column:
    """LmodParseResult encoder (Lmod/Json.hs:55-76): the 'modul' field
    renames to "module"; jobid renders as bare int (slurm), object
    (torque) or null."""
    jid = l["info"]["jobid"]
    jobid = (
        F.when(jid.isNull(), NULL())
        .when(jid["number"].isNotNull(), jnum(jid["number"]))
        .otherwise(_job_name(jid["torque"]))
    )
    info = jobjd(
        ("username", jstr(l["info"]["username"])),
        ("cluster", jstr(l["info"]["cluster"])),
        ("jobid", jobid),
    )
    load = jobjd(
        ("info", info),
        ("userload", jbool(l["userload"])),
        ("module", guard(l["module"], jobjd(
            ("name", jstr(l["module"]["name"])),
            ("version", jstr(l["module"]["version"])),
        ))),
        ("filename", jstr(l["filename"])),
    )
    cmd = jobjd(
        ("info", info),
        ("command", jstr(l["command"])),
        ("arguments", jstr(l["arguments"])),
    )
    return F.when(l["event"] == "load", load).otherwise(cmd)


def snoopy_json(s: Column) -> Column:
    """Snoopy generic encoder (Snoopy/Json.hs) — nulls kept."""
    return jobjd(
        ("pid", jnum(s["pid"])),
        ("uid", jnum(s["uid"])),
        ("username", jstr(s["username"])),
        ("sid", jnum(s["sid"])),
        ("tty", jstr(s["tty"])),
        ("cwd", jstr(s["cwd"])),
        ("executable", jstr(s["executable"])),
        ("command", jstr(s["command"])),
    )


def shorewall_json(s: Column) -> Column:
    """Hand-rolled Shorewall encoder (Shorewall/Json.hs:56-77): absent
    optional fields are OMITTED (not null). Deviation: fwdpt under its
    own key, not the reference's duplicate "fwdst" (a bug, SURVEY §7)."""
    return jobj(
        ("fwrule", jstr(s["fwrule"])),
        ("fwtarget", jstr(s["fwtarget"])),
        ("fwin", jstr(s["fwin"])),
        ("fwout", opt(s["fwout"], jstr(s["fwout"]))),
        ("fwmac", opt(s["fwmac"], jstr(s["fwmac"]))),
        ("fwsrc", jstr(s["fwsrc"])),
        ("fwdst", jstr(s["fwdst"])),
        ("fwproto", jstr(s["fwproto"])),
        ("fwspt", opt(s["fwspt"], jnum(s["fwspt"]))),
        ("fwdpt", opt(s["fwdpt"], jnum(s["fwdpt"]))),
    )


def slurm_json(s: Column) -> Column:
    """Slurm accounting encoder (north-star family, no reference
    counterpart): dense object in record order; timestamps render as
    the ISO seconds form the record carries; node_list as a JSON array
    of expanded hostnames; absent optionals (cancelled_by, unlimited
    time_limit, work_dir) render as null like the generic encoders."""
    iso = "yyyy-MM-dd'T'HH:mm:ss"
    return jobjd(
        ("jobId", jnum(s["job_id"])),
        ("user", jstr(s["user"])),
        ("uid", jnum(s["uid"])),
        ("group", jstr(s["group"])),
        ("gid", jnum(s["gid"])),
        ("name", jstr(s["job_name"])),
        ("jobState", jstr(s["job_state"])),
        ("cancelledBy", jnum(s["cancelled_by"])),
        ("partition", jstr(s["partition"])),
        ("timeLimitMinutes", jnum(s["time_limit_minutes"])),
        ("startTime", jstr(F.date_format(s["start_time"], iso))),
        ("endTime", jstr(F.date_format(s["end_time"], iso))),
        ("durationSeconds", jnum(s["duration_seconds"])),
        ("nodeList", jarr(F.transform(s["node_list"], jstr))),
        ("nodeCnt", jnum(s["node_cnt"])),
        ("procCnt", jnum(s["proc_cnt"])),
        ("workDir", jstr(s["work_dir"])),
    )


def payload_json() -> Column:
    """The <jsonkey>: payload member for a normalised row."""
    return (
        F.when(F.col("jsonkey") == "torque", torque_json(F.col("torque")))
        .when(F.col("jsonkey") == "lmod", lmod_json(F.col("lmod")))
        .when(F.col("jsonkey") == "shorewall", shorewall_json(F.col("shorewall")))
        .when(F.col("jsonkey") == "snoopy", snoopy_json(F.col("snoopy")))
        .when(F.col("jsonkey") == "slurm", slurm_json(F.col("slurm")))
    )


# Envelope JSON field names (Rsyslog generic ToJSON, Json.hs:76-78) →
# our columns; fields the logstash path leaves empty render as "".
_ENVELOPE_JSON_FIELDS = {
    "msg": ("msg", "str"),
    "timereported": ("timereported_raw", "str"),
    "hostname": ("hostname", "str"),
    "syslogtag": ("syslogtag", "str"),
    "pri": ("pri", "num"),
    "version": ("version", "num"),
    "app_name": ("appname", "str"),
}
_EMPTY_ENVELOPE_FIELDS = {
    "inputname", "fromhost", "fromhost_ip", "syslogfacility",
    "syslogseverity", "programname", "protocol_version", "procid",
}


def encode_normalised(fields: list[tuple[str, str]] | None = None) -> Column:
    """encodeNormalisedRsyslog (Json.hs:82-100).

    Default: {"message","syslog_abspri","syslog_version","program",
    "@source_host", <jsonkey>: payload}. With a fields config, emit
    {<jsonkey>: payload, <out_key>: <envelope field>, ...} — payload
    first, exactly as the reference's pairs fold (Json.hs:94-96).
    """
    # every member is always present (envelope values render 'null'
    # when absent, the payload member is the parse result itself), so
    # the whole line folds into ONE flat concat — the previous
    # build-head-then-splice (substr(head, len-1) + concat) and the
    # per-member concat towers each materialized the full line one
    # extra time per row.
    if fields is None:
        args: list = [
            '{"message":', jstr(F.col("msg")),
            ',"syslog_abspri":', jnum(F.col("pri")),
            ',"syslog_version":', jnum(F.col("version")),
            ',"program":', jstr(F.col("appname")),
            ',"@source_host":', jstr(F.col("hostname")),
            ',"', F.col("jsonkey"), '":', payload_json(), "}",
        ]
        return _fold_concat(args)

    args = ['{"', F.col("jsonkey"), '":', payload_json()]
    for out_key, field in fields:
        if field in _ENVELOPE_JSON_FIELDS:
            col, kind = _ENVELOPE_JSON_FIELDS[field]
            rendered = jstr(F.col(col)) if kind == "str" else jnum(F.col(col))
        elif field in _EMPTY_ENVELOPE_FIELDS:
            rendered = '""'
        else:
            rendered = "null"  # M.lookupDefault Null (Json.hs:95)
        args.append(f',"{out_key}":')
        args.append(rendered)
    args.append("}")
    return _fold_concat(args)
