"""Shorewall firewall-log parser as Spark Column expressions.

Re-expression of /root/reference/src/HNormalise/Shorewall/Parser.hs:
TCP (:53-78) tried first, then UDP (:87-112), then ICMP (:122-145)
— parseShorewall dispatch order (:147-152). Appname is "kernel".

Shape notes (mirroring the attoparsec structure):
* TCP lines have ``OUT=`` empty followed by a generic ``k=v`` pair
  whose *value* becomes fwmac (kvParser at :60; the key is arbitrary,
  normally MAC). No fwout.
* UDP/ICMP have ``OUT=<iface>``, no MAC.
* ICMP has no ports.
* The gap before ``PROTO=`` is skipped (manyTill/lookAhead, :66,100,133)
  → non-greedy ``.*?`` here.
* SRC/DST must be a full IPv4/IPv6/lowercase-hostname token
  (hostnameOrIPParser, Common/Parser.hs:58-64); the Host sum collapses
  to a plain string in JSON (Common/Json.hs:47-50).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from hnormalise_spark.parsing import common as C
from hnormalise_spark.schemas import SHOREWALL_PAYLOAD

_HEAD = r"^kernel:: Shorewall:([^:]*):([^:]*):IN=(\S*)"
RE_TCP = _HEAD + r"\s*OUT=\s*([^=]*)=(\S*)\s+SRC=(\S+)\s+DST=(\S+)(?s:.*?) PROTO=TCP\s+SPT=(\d+)\s+DPT=(\d+)"
RE_UDP = _HEAD + r"\s*OUT=(\S*)\s+SRC=(\S+)\s+DST=(\S+)(?s:.*?)PROTO=UDP\s+SPT=(\d+)\s+DPT=(\d+)"
RE_ICMP = _HEAD + r"\s*OUT=(\S*)\s+SRC=(\S+)\s+DST=(\S+)(?s:.*?) PROTO=ICMP"


def _null_str() -> Column:
    return F.lit(None).cast("string")


def _null_long() -> Column:
    return F.lit(None).cast("long")


def parse_shorewall(msg: Column) -> tuple[Column, Column, Column]:
    """msg → (SHOREWALL_PAYLOAD struct, parser name, parse_ok).

    Caller gates on ``msg.startswith('kernel:: Shorewall:')``.
    """
    is_tcp = msg.rlike(RE_TCP)
    is_udp = ~is_tcp & msg.rlike(RE_UDP)
    is_icmp = ~is_tcp & ~is_udp & msg.rlike(RE_ICMP)

    def host_ok(c: Column) -> Column:
        return c.rlike(C.RE_HOST_OR_IP)

    def gt(i: int) -> Column:
        return F.regexp_extract(msg, RE_TCP, i)

    def gu(i: int) -> Column:
        return F.regexp_extract(msg, RE_UDP, i)

    def gi(i: int) -> Column:
        return F.regexp_extract(msg, RE_ICMP, i)

    tcp = F.struct(
        gt(1).alias("fwrule"),
        gt(2).alias("fwtarget"),
        gt(3).alias("fwin"),
        _null_str().alias("fwout"),
        gt(5).alias("fwmac"),
        gt(6).alias("fwsrc"),
        gt(7).alias("fwdst"),
        F.lit("TCP").alias("fwproto"),
        gt(8).cast("long").alias("fwspt"),
        gt(9).cast("long").alias("fwdpt"),
    )
    udp = F.struct(
        gu(1).alias("fwrule"),
        gu(2).alias("fwtarget"),
        gu(3).alias("fwin"),
        gu(4).alias("fwout"),
        _null_str().alias("fwmac"),
        gu(5).alias("fwsrc"),
        gu(6).alias("fwdst"),
        F.lit("UDP").alias("fwproto"),
        gu(7).cast("long").alias("fwspt"),
        gu(8).cast("long").alias("fwdpt"),
    )
    icmp = F.struct(
        gi(1).alias("fwrule"),
        gi(2).alias("fwtarget"),
        gi(3).alias("fwin"),
        gi(4).alias("fwout"),
        _null_str().alias("fwmac"),
        gi(5).alias("fwsrc"),
        gi(6).alias("fwdst"),
        F.lit("ICMP").alias("fwproto"),
        _null_long().alias("fwspt"),
        _null_long().alias("fwdpt"),
    )

    ok = (
        F.when(is_tcp, host_ok(gt(6)) & host_ok(gt(7)))
        .when(is_udp, host_ok(gu(5)) & host_ok(gu(6)))
        .when(is_icmp, host_ok(gi(5)) & host_ok(gi(6)))
        .otherwise(F.lit(False))
    )
    payload = (
        F.when(ok & is_tcp, tcp)
        .when(ok & is_udp, udp)
        .when(ok & is_icmp, icmp)
        .otherwise(F.lit(None).cast(SHOREWALL_PAYLOAD))
    )
    parser = (
        F.when(ok & is_tcp, F.lit("shorewall_tcp"))
        .when(ok & is_udp, F.lit("shorewall_udp"))
        .when(ok & is_icmp, F.lit("shorewall_icmp"))
    )
    return payload, parser, ok
