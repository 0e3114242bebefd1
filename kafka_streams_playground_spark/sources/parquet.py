"""Parquet scans over the driver fixtures (batch source).

The reference's only connector is Kafka (``KafkaStreamsApp.scala:77-84``);
parquet is our batch-harness source (``TESTDATA.md``). Scans stay fully
declarative so Catalyst gets predicate pushdown + column pruning for free —
at 100 TB the difference between a pruned columnar scan and a full scan *is*
the query time.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table (``{sf_dir}/{name}.parquet``).

    ``events.ts`` is parquet TIMESTAMP(NANOS) — unsupported by Spark's reader
    — so it arrives as epoch-nanos long (``nanosAsLong`` conf, session.py) and
    is normalized here to a microsecond TimestampType (floor-truncated, same
    as DuckDB's TIMESTAMP_NS → TIMESTAMP cast).
    """
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if "ts" in df.columns and dict(df.dtypes)["ts"] == "bigint":
        # Integer division — float division would lose precision at 1e18 ns.
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Scan several fixture tables; defaults to all of :data:`TABLES`."""
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register fixture tables as temp views — the SQL front door: after
    this, ``spark.sql("SELECT ... FROM lineitem JOIN orders ...")`` works
    directly (the reference has no SQL surface at all; Catalyst gives us one
    for free). Views share the loaders' scan normalization, so SQL and
    DataFrame queries see identical schemas."""
    for n in names or TABLES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
