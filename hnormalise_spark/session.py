"""SparkSession factory with scale-oriented defaults.

Defaults are tuned for the pipeline's shape: a scan → narrow parse
projection → two filtered writes + one small aggregate. AQE is on so
the counts shuffle coalesces at runtime; Arrow is on for the few
pandas-UDF stages (tokenize / golden JSON encode).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "hnormalise-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    master defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, fallback ``*``)
    so the same entry points serve tests, bench at two parallelism
    levels, and spark-submit on a real cluster (where ``master`` is
    left to the submitter).
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and not os.environ.get("SPARK_SUBMIT_DEPLOY_MODE"):
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)

    conf = {
        # The parse plan is ~25 stacked Projects of large shared
        # expression DAGs. Substituting those into filter predicates
        # (predicate pushdown) unfolds the DAG into an exponentially
        # large tree — optimizer traversals and plan stringification
        # then take minutes (observed: a limit(5) spending 300s in
        # BinaryOperator.toString). Filters written directly against
        # source relations are unaffected (file-source pushdown is a
        # planning-time rule, not PushDownPredicates), so excluding the
        # move-filters-down rule costs nothing for this workload.
        "spark.sql.optimizer.excludedRules":
            "org.apache.spark.sql.catalyst.optimizer.PushDownPredicates",
        # Same DAG-unfolding pathology via constraint inference.
        "spark.sql.constraintPropagation.enabled": "false",
        # AQE: runtime shuffle coalescing + skew-join splitting.
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # The counts aggregate is tiny; parse stage parallelism comes
        # from input splits, not shuffles.
        "spark.sql.shuffle.partitions": str(
            shuffle_partitions
            if shuffle_partitions is not None
            else os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
        ),
        # Arrow for the pandas-UDF stages (tokenizer, golden encoder).
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        # Duplicate keys in a malformed KV body: keep a deterministic
        # winner instead of failing the job (reference behaviour is
        # positional; duplicates are pathological either way).
        "spark.sql.mapKeyDedupPolicy": "LAST_WIN",
        # Split large parquet files so local[N] saturates all N cores.
        "spark.sql.files.maxPartitionBytes": "64m",
        "spark.ui.enabled": "false",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
