"""Join operators (SURVEY.md §2.3, J1-J3).

The reference's centerpiece topology chains all three Kafka Streams join
families (``KafkaStreamsApp.scala:155-189``):

* J1 stream ⋈ KTable — state-store hash lookup, co-partitioned (``:162-165``)
* J2 stream ⋈ GlobalKTable — replicated-store lookup with a *derived* join
  key (foreign-key extractor) (``:167-171``)
* J3 stream ⋈ stream — windowed (±5 min) symmetric state-store join
  (``:177-186``)

Spark-first physical mapping: J1 = shuffled/AQE-planned hash join; J2 =
**broadcast hash join** (broadcast replication is Spark's "global table");
J3 = equi-key + time-interval join — in batch a range condition Catalyst
plans as a hash join with residual, in streaming the canonical
watermark-bounded stream-stream join.

Scale notes: broadcast only provably-small dims (the reference's GlobalKTable
carries the same "must fit on every node" contract); the interval join keys
the shuffle on the equi column, so state/skew are bounded by key cardinality,
and watermarks bound streaming state exactly like the reference's 5-minute
window retention.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def enrich_join(
    stream: DataFrame,
    table: DataFrame,
    on: list[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """J1 — enrich each stream record with the current table row for its key
    (``KafkaStreamsApp.scala:162-165``). Inner by default: no output for a
    missing key, exactly the reference joiner's behavior."""
    return stream.join(table, on=on, how=how)


def global_lookup_join(
    stream: DataFrame,
    dim: DataFrame,
    key_extractor: Column | str,
    dim_key: str,
    how: str = "inner",
) -> DataFrame:
    """J2 — GlobalKTable lookup with a foreign-key extractor (``:167-171``).

    ``key_extractor`` derives the lookup key from the stream row (the
    reference extracts the *profile* produced by J1, not the stream key —
    no co-partitioning needed). ``broadcast(dim)`` replicates the dim to every
    task: the exact analogue of the GlobalKTable's full replication
    (``:159-160``).

    A string ``key_extractor`` is bound to the *stream* side, so stream and
    dim may share the column name without an ambiguous-reference error.
    """
    key = stream[key_extractor] if isinstance(key_extractor, str) else key_extractor
    return stream.join(F.broadcast(dim), on=key == dim[dim_key], how=how)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    extra_condition: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """J3 — windowed stream-stream join (``:177-186``).

    Matches ``left_key = right_key AND right_ts BETWEEN left_ts - lower AND
    left_ts + upper`` (the reference's ``JoinWindows.of(5.minutes)``,
    ``:182``). ``extra_condition`` folds the joiner's Option-filter (the
    ``payment.status == "PAID"`` check at ``:179-180``) directly into the
    join, which Catalyst then pushes to the smaller side — idiomatically
    replacing the joiner+flatten pair (``:185``).

    ``how``: Kafka Streams' ``JoinWindows`` joins are inner-only at the
    reference's API level; Spark gives ``leftOuter``/``rightOuter``/
    ``fullOuter`` for free (SURVEY §2.3) — in streaming, unmatched rows are
    null-padded and emitted once the watermark closes their window.

    Works on batch DataFrames as-is; for streaming inputs apply
    ``withWatermark`` to both sides first (:mod:`..streaming.watermarks`).
    """
    cond = (left[left_key] == right[right_key]) & right[right_ts].between(
        left[left_ts] - F.expr(f"INTERVAL {lower}"),
        left[left_ts] + F.expr(f"INTERVAL {upper}"),
    )
    if extra_condition is not None:
        cond = cond & extra_condition
    return left.join(right, on=cond, how=how)
