"""Batch/stream sink writers (SURVEY.md §2.1 S4-S5 beyond Kafka).

The reference writes only to Kafka topics (``KafkaStreamsApp.scala:110,
:188``). A pipeline at 100 TB lands results in columnar storage; these
helpers encode the layout decisions that matter there:

* ``partitionBy`` on low-cardinality routing columns (lang, date, source)
  → partition pruning for downstream readers;
* ``maxRecordsPerFile`` caps file size so a skewed partition doesn't become
  one unsplittable multi-GB file;
* sorting within partitions (``sortWithinPartitions``) before write gives
  downstream scans clustered row-groups (min-max pruning on the sort key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter


def write_parquet(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = (),
    sort_cols: tuple[str, ...] = (),
    max_records_per_file: int | None = 5_000_000,
    mode: str = "overwrite",
) -> None:
    """Write a batch result as (optionally partitioned, clustered) parquet."""
    out = df.sortWithinPartitions(*sort_cols) if sort_cols else df
    writer = out.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def write_parquet_stream(
    sdf: DataFrame,
    path: str,
    checkpoint_location: str,
    partition_cols: tuple[str, ...] = (),
    output_mode: str = "append",
) -> DataStreamWriter:
    """Build a streaming parquet sink (exactly-once via checkpoint + file
    manifest — stronger than the reference's at-least-once Kafka default).
    Caller invokes ``.start()``."""
    writer = (
        sdf.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_location)
        .outputMode(output_mode)
    )
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    return writer
