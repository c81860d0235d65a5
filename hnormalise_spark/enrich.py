"""Broadcast lookup-table enrichment (north_rule addition; the
reference has no joins — SURVEY §2.7).

Small dimension tables (host → cluster metadata, cluster → site,
uid → username) are broadcast-joined onto the parsed stream: at
10^12-row scale the fact side never shuffles — each executor gets the
(tiny) hash map and the join pipelines inside the scan stage. Verify
with .explain(): every join below must show BroadcastHashJoin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F



def synth_lookup_tables(spark: SparkSession, n_hosts: int = 500, n_users: int = 500):
    """Deterministic lookup tables matching datagen's host/user space
    (FIXTURES.md §4)."""
    hosts = spark.range(n_hosts).select(
        F.format_string("node%04d.c%d.example.org", F.col("id"), F.col("id") % 7).alias("hostname"),
        F.format_string("c%d", F.col("id") % 7).alias("cluster"),
        F.format_string("rack%02d", F.col("id") % 40).alias("rack"),
        F.format_string("10.%d.%d.%d", F.col("id") % 8, (F.col("id") / 256).cast("int"), F.col("id") % 256).alias("ip"),
    )
    clusters = spark.range(7).select(
        F.format_string("c%d", F.col("id")).alias("cluster"),
        F.when(F.col("id") % 2 == 0, "site-a").otherwise("site-b").alias("site"),
        F.lit("torque").alias("scheduler"),
    )
    users = spark.range(n_users).select(
        F.col("id").cast("int").alias("uid"),
        F.format_string("user%03d", F.col("id")).alias("username"),
        F.format_string("group%02d", F.col("id") % 20).alias("group"),
    )
    return hosts, clusters, users


def enrich(
    parsed: DataFrame,
    host_meta: DataFrame,
    cluster_meta: DataFrame | None = None,
    user_meta: DataFrame | None = None,
) -> DataFrame:
    """Left-join broadcast enrichment onto parsed rows.

    - envelope hostname → host_meta (cluster, rack, ip)
    - host cluster → cluster_meta (site, scheduler)
    - snoopy uid → user_meta (resolved username/group)
    """
    hm = F.broadcast(
        host_meta.select(
            F.col("hostname").alias("_hm_hostname"),
            F.col("cluster").alias("host_cluster"),
            F.col("rack").alias("host_rack"),
            F.col("ip").alias("host_ip"),
        )
    )
    out = parsed.join(hm, parsed["hostname"] == hm["_hm_hostname"], "left").drop(
        "_hm_hostname"
    )
    if cluster_meta is not None:
        cm = F.broadcast(
            cluster_meta.select(
                F.col("cluster").alias("_cm_cluster"),
                F.col("site").alias("cluster_site"),
                F.col("scheduler").alias("cluster_scheduler"),
            )
        )
        out = out.join(cm, out["host_cluster"] == cm["_cm_cluster"], "left").drop(
            "_cm_cluster"
        )
    if user_meta is not None:
        um = F.broadcast(
            user_meta.select(
                F.col("uid").alias("_um_uid"),
                F.col("username").alias("uid_username"),
                F.col("group").alias("uid_group"),
            )
        )
        out = out.join(um, out["snoopy"]["uid"] == um["_um_uid"], "left").drop(
            "_um_uid"
        )
    return out
