"""Snoopy exec-log parser as Spark Column expressions.

Re-expression of /root/reference/src/HNormalise/Snoopy/Parser.hs:55-77:
``snoopy[PID]<skip-to-[>[uid:N [username:U] sid:N tty:T cwd:C
filename:F]: CMD``. Appname is "snoopy".

* executable (filename:) is take-till-']' so it may contain spaces;
  tty/cwd/username are take-till-space.
* command is everything after ``]:`` with leading whitespace stripped.
* A present-but-empty ``username:`` is folded into null (the reference
  would yield Just ""; never occurs in practice).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from hnormalise_spark.parsing import common as C
from hnormalise_spark.schemas import SNOOPY_PAYLOAD

RE_SNOOPY = (
    r"^snoopy\[(\d+)\][^\[]*\[uid:(\d+)"
    r"(?:\s*username:(\S*))?"
    r"\s*sid:(\d+)\s*tty:(\S*)\s*cwd:(\S*)\s*filename:([^\]]*)\]:\s*((?s:.*))$"
)


def layers(gate: Column, msg: Column) -> list[dict[str, Column]]:
    layer1 = {"_sn_ok": F.when(gate, msg.rlike(RE_SNOOPY)).otherwise(F.lit(False))}

    def g(i: int) -> Column:
        return F.when(F.col("_sn_ok"), F.regexp_extract(msg, RE_SNOOPY, i))

    layer2 = {f"_sn_g{i}": g(i) for i in range(1, 9)}
    return [layer1, layer2]


def result() -> tuple[Column, Column, Column]:
    ok = F.col("_sn_ok")
    payload = F.struct(
        F.col("_sn_g1").cast("int").alias("pid"),
        F.col("_sn_g2").cast("int").alias("uid"),
        C.nullif_empty(F.col("_sn_g3")).alias("username"),
        F.col("_sn_g4").cast("int").alias("sid"),
        F.col("_sn_g5").alias("tty"),
        F.col("_sn_g6").alias("cwd"),
        F.col("_sn_g7").alias("executable"),
        F.col("_sn_g8").alias("command"),
    )
    payload = F.when(ok, payload).otherwise(F.lit(None).cast(SNOOPY_PAYLOAD))
    return payload, F.when(ok, F.lit("snoopy")), ok


INTERMEDIATE_COLS = ["_sn_ok"] + [f"_sn_g{i}" for i in range(1, 9)]
