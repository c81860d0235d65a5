"""Shared Spark session + parsed fixture corpus for the test suite."""

from __future__ import annotations

import pytest

from hnormalise_spark import get_spark
from hnormalise_spark import pipeline as P
from hnormalise_spark.fixtures import CORPUS


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", app_name="hnormalise-tests", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def parsed_corpus(spark):
    """CORPUS through the full pipeline once; dict doc_id → Row."""
    rows = [(i, s, p, l) for (i, s, p, l) in CORPUS]
    df = spark.createDataFrame(
        rows, "doc_id string, source string, expected_parser string, raw string"
    )
    parsed = P.normalise(df)
    return {r["doc_id"]: r for r in parsed.collect()}


def col_values(spark, values, expr_fn, dtype="string"):
    """Run a Column-expression helper over literal values, return list."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(v,) for v in values], f"v {dtype}")
    return [r["out"] for r in df.select(expr_fn(F.col("v")).alias("out")).collect()]
