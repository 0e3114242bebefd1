"""Streaming KTable — latest value per key as live state (SURVEY.md §4.3-1).

The batch materialization lives in :mod:`..operators.tables`; this is the
*streaming* form: a continuously-updated latest-per-key table, the direct
analogue of ``builder.table`` over a compacted topic
(``KafkaStreamsApp.scala:156-157``, compaction config ``:31-35``).

Implementation: a streaming aggregation ``groupBy(key).agg(max_by(values,
version))`` in update mode. ``max_by`` keeps exactly one value per key in the
state store (state size = #keys, the same bound as the reference's RocksDB
table store), and update mode emits a changelog row whenever a key's value
changes — Kafka Streams' KTable emission semantics (SURVEY §2.9). All
JVM-side: no Python state handler needed for this fold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def latest_per_key_stream(
    sdf: DataFrame,
    keys: list[str],
    value_cols: list[str],
    version_col: Column,
) -> DataFrame:
    """Continuously-updated latest-per-key table over a streaming input.

    ``version_col`` orders the changelog (event time, offset, ...); ties
    should be broken by a second component packed into a struct, e.g.
    ``F.struct("ts", "event_id")`` — struct max_by compares lexicographically.
    Output columns: ``keys + value_cols``.
    """
    latest = F.max_by(F.struct(*[F.col(c) for c in value_cols]), version_col).alias("_latest")
    out = sdf.groupBy(*[F.col(k) for k in keys]).agg(latest)
    return out.select(*keys, "_latest.*")
