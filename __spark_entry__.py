"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over :mod:`kafka_streams_playground_spark.plans.registry` — the
engine's central query registry. Each registered query is a Spark callable
``(spark, sf_dir) -> DataFrame``; SQL-expressible ones carry a DuckDB oracle
string (driver compares row count + schema + order-insensitive value hash at
sf=0.01). See SURVEY.md §2 for the operator inventory each query covers.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_streams_playground_spark.plans import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Q5 ``paidOrdersTopology`` analogue,
    KafkaStreamsApp.scala:155-189) on /root/testdata/sf0.001."""
    return REGISTRY["q5_paid_orders"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted → rows-only check)."""
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
