"""Template mining / drift / burst detection (ops/logmine.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hnormalise_spark.ops import logmine as LM


def _mask(spark, lines):
    df = spark.createDataFrame([(s,) for s in lines], "raw string")
    return [r["t"] for r in df.select(LM.mask_line(F.col("raw")).alias("t")).collect()]


def test_mask_line_shapes(spark):
    got = _mask(
        spark,
        [
            "sshd[2212]: Accepted publickey for user42 from 10.1.2.3 port 5022",
            "kernel: CPU3: temperature above threshold (75 C)",
            "error at 0xDEADbeef in module 7",
            "plain text with no variables",
        ],
    )
    assert got == [
        "sshd[<N>]: Accepted publickey for user<N> from <IP> port <N>",
        "kernel: CPU<N>: temperature above threshold (<N> C)",
        "error at <HEX> in module <N>",
        "plain text with no variables",
    ]


def test_mask_line_ip_before_num(spark):
    # the dotted quad must collapse to ONE <IP>, not four <N>.<N>...
    (got,) = _mask(spark, ["src 192.168.254.1 dst 8.8.8.8"])
    assert got == "src <IP> dst <IP>"


def test_mask_line_null_propagates(spark):
    df = spark.createDataFrame([(None,)], "raw string")
    (row,) = df.select(LM.mask_line(F.col("raw")).alias("t")).collect()
    assert row["t"] is None


def test_mine_templates_counts_and_share(spark):
    lines = (
        ["sshd[%d]: fail from 10.0.0.%d" % (i, i) for i in range(6)]
        + ["kernel: CPU%d up" % i for i in range(3)]
        + ["oom killed pid %d" % i for i in range(1)]
    )
    df = spark.createDataFrame([(s,) for s in lines], "raw string")
    out = {r["template"]: r for r in LM.mine_templates(df).collect()}
    assert out["sshd[<N>]: fail from <IP>"]["n_lines"] == 6
    assert out["kernel: CPU<N> up"]["n_lines"] == 3
    assert out["oom killed pid <N>"]["n_lines"] == 1
    # exact integer ppm: floor(n*1e6/10 + .5)
    assert out["sshd[<N>]: fail from <IP>"]["share_ppm"] == 600000
    assert out["oom killed pid <N>"]["share_ppm"] == 100000
    assert sum(r["share_ppm"] for r in out.values()) == 1_000_000


def test_template_drift_statuses(spark):
    old = ["A %d" % i for i in range(8)] + ["B %d" % i for i in range(2)] + ["D 1"]
    new = ["A %d" % i for i in range(2)] + ["B %d" % i for i in range(8)] + ["C 1"]
    odf = spark.createDataFrame([(s,) for s in old], "raw string")
    ndf = spark.createDataFrame([(s,) for s in new], "raw string")
    out = {r["template"]: r for r in LM.template_drift(odf, ndf).collect()}
    assert out["A <N>"]["status"] == "shifted"  # 8/11 -> 2/11
    assert out["B <N>"]["status"] == "shifted"  # 2/11 -> 8/11
    assert out["C <N>"]["status"] == "new"
    assert out["D <N>"]["status"] == "gone"
    assert out["C <N>"]["n_old"] == 0 and out["C <N>"]["n_new"] == 1
    assert out["D <N>"]["share_new_ppm"] == 0


def test_template_drift_stable(spark):
    old = ["A %d" % i for i in range(5)] + ["B %d" % i for i in range(5)]
    new = ["A %d" % i for i in range(4)] + ["B %d" % i for i in range(6)]
    odf = spark.createDataFrame([(s,) for s in old], "raw string")
    ndf = spark.createDataFrame([(s,) for s in new], "raw string")
    out = {r["template"]: r["status"] for r in LM.template_drift(odf, ndf).collect()}
    assert out == {"A <N>": "stable", "B <N>": "stable"}


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def test_error_burst_fires_exactly_on_integer_threshold(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    # user 1: buckets of 1,1,1,5 events -> total 8, nb 4, mean 2.
    # At threshold 2/1 only the 5-bucket fires: 5*4*1=20 > 2*8=16,
    # while 1*4=4 > 16 is false.
    for h, n in enumerate([1, 1, 1, 5]):
        for i in range(n):
            rows.append((1, t0 + dt.timedelta(hours=h, minutes=i)))
    # user 2: perfectly flat 2,2,2 -> never fires (2*3=6 > 2*6=12 false).
    for h in range(3):
        for i in range(2):
            rows.append((2, t0 + dt.timedelta(hours=h, minutes=i)))
    out = LM.error_burst(
        _events(spark, rows), threshold_num=2, threshold_den=1
    ).collect()
    assert len(out) == 1
    (r,) = out
    assert r["entity"] == 1 and r["n_events"] == 5
    # ratio = 5 * 4 / 8 = 2.5x mean -> 2_500_000 ppm exact
    assert r["ratio_ppm"] == 2_500_000


def test_error_burst_boundary_is_strict(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    # user with buckets 1,3 -> total 4, nb 2; 3*2 == 6 == 3/2 * 4 * 2?
    # threshold 3/2: fires iff n*nb*2 > 3*total -> 3*2*2=12 > 12 is
    # FALSE: exact boundary must NOT fire (strict inequality).
    rows = [(1, t0)] + [(1, t0 + dt.timedelta(hours=1, minutes=i)) for i in range(3)]
    out = LM.error_burst(
        _events(spark, rows), threshold_num=3, threshold_den=2
    ).collect()
    assert out == []


def test_mine_templates_single_shuffle_plan(spark):
    """The aggregate must combine map-side: exactly one Exchange up to
    the template counts (the share window adds a single-partition
    exchange over the collapsed table, which is template-cardinality,
    not row-cardinality)."""
    df = spark.createDataFrame([("x %d" % i,) for i in range(10)], "raw string")
    tpl = df.select(LM.mask_line(F.col("raw")).alias("template"))
    counts = tpl.groupBy("template").agg(F.count(F.lit(1)).alias("n"))
    plan = counts._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
