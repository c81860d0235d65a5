"""Huppel toy parser — kept for parity with the reference's library
surface (/root/reference/src/HNormalise/Huppel/Parser.hs:53-56,
``huppel <int>`` → Huppel {id}).

Like the reference, it is wired into the library but EXCLUDED from the
dispatch list (commented out of getJsonKey, Parser.hs:84): pipeline.
FAMILIES does not include it. Use parse() directly for demos/tests.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

RE_HUPPEL = r"^huppel\s+(\d{1,18})"


def parse(msg: Column) -> Column:
    """msg → struct<id:long> (null when not a huppel message)."""
    ok = msg.rlike(RE_HUPPEL)
    return F.when(
        ok,
        F.struct(F.regexp_extract(msg, RE_HUPPEL, 1).cast("long").alias("id")),
    )
