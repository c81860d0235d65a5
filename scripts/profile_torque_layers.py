#!/usr/bin/env python
"""Per-layer wall-clock profile of the torque parse (the repo's most
expensive family) on the parse_torque_exit workload at sf0.1.

Times cumulative prefixes of ``parsing.torque.layers()`` applied over
the envelope-parsed frame (each leg warmed first so one-time Janino
compilation is excluded — same policy as bench.py), then the full
parse_torque_exit query. The per-layer DELTA is the wall cost that
layer's expressions + its Project's row materialization add. Published
in BASELINE.md; re-run with:

    python scripts/profile_torque_layers.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import force, timed  # noqa: E402


def main() -> int:
    from pyspark.sql import functions as F

    from hnormalise_spark import get_spark

    spark = get_spark(master="local[32]", app_name="torque-layers")
    spark.range(10).count()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as e  # noqa: E402
    from hnormalise_spark import pipeline as P
    from hnormalise_spark.parsing import torque

    def base():
        ev = spark.read.parquet(f"{sf}/events.parquet").select(
            F.col("event_id").cast("long").alias("k")
        )
        k = F.col("k")
        line = e._env(e._torque_exit_line(k), k)
        df = e._spread(ev).select(
            F.format_string("tq-%d", k).alias("doc_id"), line.alias("raw")
        )
        return P._envelope_stage(df, "raw")

    n_layers = len(torque.layers(F.lit(True), F.lit("")))

    def upto(n: int):
        df = base()
        gate = F.col("_family") == "torque"
        barriers = getattr(torque, "LAYER_BARRIERS", ())
        if 0 in barriers:
            df = P.codegen_barrier(df)
        for idx, layer in enumerate(torque.layers(gate, F.col("msg")), 1):
            if idx > n:
                break
            df = df.withColumns(layer)
            if idx in barriers:
                df = P.codegen_barrier(df)
        return df

    prev = None
    legs = [("envelope", base)] + [
        (f"+layer{n}", (lambda n=n: upto(n))) for n in range(1, n_layers + 1)
    ]
    for name, mk in legs:
        force(mk())  # warm: exclude one-time codegen/JIT
        w, sp, _ = timed(lambda: force(mk()))
        rec = {"stage": name, "cum_sec": round(w, 2), "steal_pct": sp}
        if prev is not None:
            rec["delta_sec"] = round(w - prev, 2)
        prev = w
        print(json.dumps(rec), flush=True)

    q = e.queries()["parse_torque_exit"]
    force(q(spark, sf))
    w, sp, _ = timed(lambda: force(q(spark, sf)))
    print(
        json.dumps(
            {
                "stage": "full parse_torque_exit query",
                "cum_sec": round(w, 2),
                "steal_pct": sp,
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
