"""Grouping & aggregation operators (SURVEY.md §2.4, A1-A5).

Reference surface: key-changing ``groupBy`` (``KafkaStreamsApp.scala:125-128``),
``groupByKey`` (``:140``), continuous ``count`` (``:144``), 10-second tumbling
custom fold that *is* count (``:142, :146-148``), and changelog emission via
``toStream`` (``:150``).

Spark-first: ``groupBy(...).agg(...)`` — Catalyst plans a partial (map-side)
aggregate before the shuffle and a final aggregate after, which the reference's
single-phase per-key state update cannot do; at 100 TB the partial agg is what
keeps the shuffle small. Tumbling windows are the ``window()`` struct column;
changelog emission is ``outputMode("update")`` on the streaming query
(:mod:`..streaming`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def count_by(df: DataFrame, *keys: Column | str, out: str = "cnt") -> DataFrame:
    """A1/A2/A3 — grouped running count (``groupBy`` ``:125-128`` +
    ``count`` ``:144``; also completes the reference's dead-code A1 group)."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(out))


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[Column | str],
    aggs: list[Column],
    window_alias: str = "window",
) -> DataFrame:
    """A4 — tumbling-window aggregate (``windowedBy(TimeWindows.of(10 s))
    .aggregate`` ``:142, :146-148``).

    The ``window(ts, duration)`` struct plays ``Windowed[K]`` (SURVEY §1.1).
    Windows are epoch-aligned in both Kafka Streams and Spark, so batch
    results agree with the oracle's ``time_bucket``.
    """
    return df.groupBy(F.window(F.col(ts_col), duration).alias(window_alias), *keys).agg(*aggs)


def tumbling_count(
    df: DataFrame, ts_col: str, duration: str, *keys: Column | str, out: str = "cnt"
) -> DataFrame:
    """A4 specialization — the reference's fold ``(counter + 1)`` starting at
    ``0L`` (``:148``) is exactly COUNT."""
    return tumbling_window_agg(df, ts_col, duration, list(keys), [F.count(F.lit(1)).alias(out)])
