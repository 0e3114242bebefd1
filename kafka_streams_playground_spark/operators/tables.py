"""KTable semantics — latest value per key (SURVEY.md §2.1 S2, §4.3-1).

A Kafka Streams ``KTable`` (``builder.table`` ``KafkaStreamsApp.scala:156-157``
over a compacted topic ``:31-35``) is a changelog stream materialized as the
latest value per key. Spark-first equivalents, in increasing streaming
fidelity:

* batch snapshot — ``row_number() over (partition by key order by version
  desc) = 1``: one shuffle on the key, then a per-partition sort; the
  idiomatic "compaction" of a changelog table. Used by the oracle-checked
  queries here.
* streaming — latest-per-key keyed state via ``dropDuplicatesWithinWatermark``
  / ``applyInPandasWithState`` (:mod:`..streaming.ktable`).

A ``GlobalKTable`` (``:159-160``) needs no operator: it is a small dim
DataFrame passed through ``F.broadcast`` at the join (J2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(df: DataFrame, keys: list[str], order_by: list[Column]) -> DataFrame:
    """Materialize the latest row per key (S2).

    ``order_by`` is the changelog order, newest first — e.g.
    ``[F.col("ts").desc(), F.col("event_id").desc()]`` (the tiebreak keeps the
    result deterministic, which the oracle compare requires).

    Scale: one hash-partition exchange on ``keys``; no global sort. Skewed
    keys are handled by AQE; for a true changelog at 100 TB prefer the
    streaming variant whose state store holds exactly one row per key.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
