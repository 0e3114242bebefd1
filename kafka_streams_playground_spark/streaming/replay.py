"""Fixture replay as streams + run-to-completion harness.

The reference's topics are unbounded; the fixtures are finite parquet. A
file-stream source (``spark.readStream.schema(...).parquet``) replays a
fixture table through the *streaming* execution path — real micro-batches,
state stores, watermarks — and ``trigger(availableNow=True)`` drains it to
completion so tests/oracle checks see the final state (FIXTURES.md §C).

Each fixture table is a single parquet file, so availableNow drains in one
micro-batch — making update-mode output equal to the complete final state,
which is what the DuckDB oracle checks. (With Kafka sources the same
pipelines run continuously; nothing below depends on batch finiteness.)
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_stream_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Replay a fixture table as a streaming DataFrame (S1 analogue).

    Schema is taken from the batch reader (cheap footer read). The events
    table's TIMESTAMP(NANOS) column arrives as epoch-nanos long (see
    sources.parquet) and is normalized to TimestampType here too.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    schema = spark.read.parquet(path).schema
    # The file-stream source wants a directory; glob-filter to this table.
    sdf = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", f"{name}.parquet")
        .parquet(sf_dir)
    )
    if "ts" in sdf.columns and dict(sdf.dtypes)["ts"] == "bigint":
        sdf = sdf.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return sdf


def latest_update_state(drained: DataFrame, key, counter) -> DataFrame:
    """Reduce an update-mode memory-sink drain to the FINAL state row per
    key (a column name or list of names). The sink keeps one row per
    (key, emitting micro-batch); for aggregates whose ``counter`` column
    expression is strictly monotone in rows seen (counts, count sums),
    the max-counter row per key IS the last emission — so the result
    equals the batch aggregate under ANY micro-batch split, not just
    single-file fixtures (ADVICE r9). Bounded: |keys| × micro-batches
    rows."""
    from pyspark.sql import Window

    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(counter.desc())
    return (
        drained.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def run_to_completion(
    sdf: DataFrame,
    output_mode: str = "update",
    spark: SparkSession | None = None,
) -> DataFrame:
    """Drain a streaming DataFrame with availableNow into a memory sink and
    return the sink contents as a batch DataFrame.

    The memory sink is driver-resident — strictly a test/oracle harness; the
    production path is the Kafka/file sink writers. Checkpoints go to a fresh
    temp dir (exactly-once within the run, like the reference's at-least-once
    default this is not a durability statement, SURVEY §2.9).
    """
    spark = spark or sdf.sparkSession
    name = f"mem_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="ksp_ckpt_")
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
    finally:
        # The memory-sink result is already materialized; the checkpoint's
        # state store has no value past the drain — remove it so repeated
        # test/oracle/bench runs don't leak /tmp directories.
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)
